package graft

import graft.core.Sessions

/** Dev-only: reproduce Bench's harness sequence for a subset of queries
  * (args = query names; default dedup_clusters) to isolate outliers. */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_clusters")
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    spark.catalog.clearCache()
    queries.Fixtures.reset()
    val qmap = SparkEntry.queries
    for (pass <- 1 to 2) {
      for (name <- names) {
        val t0 = System.nanoTime()
        qmap(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[debugbench] pass$pass $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.catalog.clearCache()
      queries.Fixtures.reset()
    }
    spark.stop()
  }
}
