package graft

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/**
 * Driver-run benchmark: times every contract query at the given scale
 * factor and prints one JSON line. Queries are materialized through the
 * noop sink (not count()) so column-pruning can't skip the measured work
 * (count(*) would let Catalyst drop every computed column).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: run the sf0.001 flagship once so JIT + codegen +
    // parquet-reader init aren't billed to whichever query sorts first.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    // The warmup built the sf0.001 flagship fixture; forget it so a bench
    // at sf0.001 still times that domain build in pass 1.
    spark.catalog.clearCache()
    queries.Fixtures.reset()

    // Stable order for comparable per-query numbers across rounds.
    val names = SparkEntry.queries.keys.toSeq.sorted
    def runAll(): Map[String, Double] = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // Best of two full passes: wall-clock noise on a shared box swings
    // single runs by ±50%. The cache is cleared between passes so each
    // pass re-does the real work (operator-internal persists would
    // otherwise turn pass 2 into a cache read), and the domain fixtures
    // are forgotten so build queries time the build in every pass.
    val rep1 = runAll()
    spark.catalog.clearCache()
    queries.Fixtures.reset()
    val rep2 = runAll()
    val results = names.map(n => n -> math.min(rep1(n), rep2(n)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s"}""")
    spark.stop()
  }
}
