package graft

import graft.core.Sessions

/** Dev-only: stage-attributed timing of the pipeline_dedup_index BUILD
  * half (VERDICT r8 task 4: the build drifted 2.9→3.58 s across driver
  * rounds while probe held — split signature/banding/bucket-agg/publish
  * so a regression points at a stage). Two passes per stage, min
  * reported, fixtures + cache reset between passes like Bench. */
object DebugDedupStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    def corpus = queries.Fixtures.table(spark, sfDir, "documents")
      .where(col("doc_id") % queries.PipelineQueries.DeltaMod =!= 0)
    def timeIt(what: String)(f: => Unit): Double = {
      val best = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        queries.Fixtures.reset()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[stages] $what%-22s ${best}%.2f s")
      best
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    timeIt("shingles")(noop(Dedup.wordShingles(corpus, "doc_id", "text")))
    timeIt("signatures")(noop(Dedup.minHashSignatures(Dedup.wordShingles(corpus, "doc_id", "text"))))
    timeIt("bands")(noop(Dedup.lshBands(Dedup.minHashSignatures(Dedup.wordShingles(corpus, "doc_id", "text")))))
    timeIt("bucket-agg (kv rows)")(noop(Dedup.bandIndexKv(corpus, "doc_id", "text")))
    timeIt("full build (publish)")(queries.PipelineQueries.dedupIndexStore(spark, sfDir))
    // probe timed against a PREBUILT store (outside the timer), so the
    // memoized-fixture rebuild never pollutes the probe number
    val probeBest = (1 to 2).map { _ =>
      spark.catalog.clearCache()
      queries.Fixtures.reset()
      queries.PipelineQueries.dedupIndexStore(spark, sfDir)
      val t0 = System.nanoTime()
      noop(queries.PipelineQueries.dedupIndexProbe(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[stages] ${"probe"}%-22s ${probeBest}%.2f s")
    spark.stop()
  }
}

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
