package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.Dedup

/** Dev-only (optimization r16): the minhash family's final plans show
  * ReusedExchange on the shingle collect_set and the band repartition,
  * yet job-group stage stats prove BOTH executed twice (the duplicate
  * runs sit under broadcast-stage subtrees). Quantify what an eager
  * localCheckpoint of (a) the shingle frame, (b) the bands frame buys
  * before touching the operator. */
object DebugMinhashVariants {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = new StageStats("mhv")
    spark.sparkContext.addSparkListener(stats)
    def corpus = queries.Fixtures.table(spark, sfDir, "documents")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[mhv] warmup failed: $e") }
    spark.catalog.clearCache()
    queries.Fixtures.reset()

    def timeIt(what: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        queries.Fixtures.reset()
        spark.sparkContext.setJobGroup("mhv", what)
        stats.reset()
        val t0 = System.nanoTime()
        f
        val s = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        s
      }
      Thread.sleep(300)
      println(f"[mhv] $what%-28s best ${times.min}%6.2f s  all ${times.map(t => f"$t%.2f").mkString(" ")}  " +
        f"shuffle ${stats.shuffleRecords.get()}%,d rec ${stats.shuffleBytes.get() / (1024 * 1024)}%,d MB (last run)")
    }

    timeIt("A current minHashPairs") {
      noop(Dedup.minHashPairs(corpus, "doc_id", "text", 0.8, failOversized = true))
    }
    timeIt("B ckpt shingles") {
      val sh = Dedup.wordShingles(corpus, "doc_id", "text").localCheckpoint(true)
      try {
        val cand = Dedup.lshCandidates(
          Dedup.lshBands(Dedup.minHashSignatures(sh)), failOversized = true)
        noop(Dedup.exactJaccardOfCandidates(sh, cand, 0.8))
      } finally sh.unpersist()
    }
    timeIt("C ckpt shingles+bands") {
      val sh = Dedup.wordShingles(corpus, "doc_id", "text").localCheckpoint(true)
      val bands = Dedup.lshBands(Dedup.minHashSignatures(sh)).localCheckpoint(true)
      try {
        val cand = Dedup.lshCandidates(bands, failOversized = true)
        noop(Dedup.exactJaccardOfCandidates(sh, cand, 0.8))
      } finally { sh.unpersist(); bands.unpersist() }
    }
    timeIt("D ckpt bands only") {
      val sh = Dedup.wordShingles(corpus, "doc_id", "text")
      val bands = Dedup.lshBands(Dedup.minHashSignatures(sh)).localCheckpoint(true)
      try {
        val cand = Dedup.lshCandidates(bands, failOversized = true)
        noop(Dedup.exactJaccardOfCandidates(sh, cand, 0.8))
      } finally bands.unpersist()
    }
    // E: pure-shuffle plan (broadcasts off in a conf-isolated session):
    // if the duplicate map-stage executions disappear, the pathology is
    // specific to ReusedExchange under BROADCAST builds.
    locally {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val corpus2 = queries.Fixtures.table(s2, sfDir, "documents")
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        queries.Fixtures.reset()
        s2.sparkContext.setJobGroup("mhv", "E")
        stats.reset()
        val t0 = System.nanoTime()
        Dedup.minHashPairs(corpus2, "doc_id", "text", 0.8, failOversized = true)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        s2.sparkContext.clearJobGroup()
        s
      }
      Thread.sleep(300)
      println(f"[mhv] E no-broadcast session        best ${times.min}%6.2f s  all ${times.map(t => f"$t%.2f").mkString(" ")}  " +
        f"shuffle ${stats.shuffleRecords.get()}%,d rec ${stats.shuffleBytes.get() / (1024 * 1024)}%,d MB (last run)")
      stats.report("mhv E", top = 8)
    }
    // row-identity spot check: A == C
    locally {
      val a = Dedup.minHashPairs(corpus, "doc_id", "text", 0.8, failOversized = true)
      val sh = Dedup.wordShingles(corpus, "doc_id", "text").localCheckpoint(true)
      val bands = Dedup.lshBands(Dedup.minHashSignatures(sh)).localCheckpoint(true)
      val c = Dedup.exactJaccardOfCandidates(sh, Dedup.lshCandidates(bands, failOversized = true), 0.8)
      val onlyA = a.exceptAll(c).count()
      val onlyC = c.exceptAll(a).count()
      println(s"[mhv] identity: onlyA=$onlyA onlyC=$onlyC (must be 0/0)")
      sh.unpersist(); bands.unpersist()
    }
    spark.stop()
  }
}
