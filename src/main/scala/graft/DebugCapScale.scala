package graft

import org.apache.spark.sql.functions._

import graft.core.Sessions

/**
 * Dev-only: the CAPPED-AGGREGATE build audit (round 14's
 * [[graft.core.BoundedCollectAgg]] claim, measured). A corpus of
 * `docs` IDENTICAL documents makes every band bucket hot (all docs in
 * all 32 buckets — the boilerplate-cluster degenerate case); the build
 * must tombstone them WITHOUT the exchange ever carrying their member
 * rows: each map task's partial buffer overflows at the cap and ships a
 * constant-size marker. The legible number is the aggregate exchange's
 * total SHUFFLE WRITE RECORDS for the whole build job group — with
 * 32 buckets × 32 map partitions it must be ~thousands of rows, not
 * docs × 32 (the r13 count-first layout repartitioned every hot row
 * into one shuffle partition just to count it there: 32M records at 1M
 * docs). Stage skew printed alongside (max ≈ mean everywhere — the
 * minhash map work is uniform).
 *
 * Usage: runMain graft.DebugCapScale [docs=1048576]
 */
object DebugCapScale {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(1L << 20)
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sharedText = (1 to 40).map(i => s"boilerplate${i % 7} clause$i shared").mkString(" ")
    val corpus = spark.range(docs)
      .select(col("id").as("doc_id"), lit(sharedText).as("text"))
      .localCheckpoint(true) // fixture off the clock

    val group = "cap-scale"
    val stats = new StageStats(group)
    spark.sparkContext.addSparkListener(stats)
    // remove in finally (the DebugTakedownScale pattern): a leaked
    // listener keeps accumulating into a dead audit if this main is ever
    // embedded in a longer-lived session
    try {
      spark.sparkContext.setJobGroup(group, "capped band-index build")
      val t0 = System.nanoTime()
      val built = operators.Dedup.bandIndexKv(corpus, "doc_id", "text")
      val rows = built.count()
      val tomb = built
        .where(graft.functions.bytes_utf8(col("value")) === lit(graft.core.IndexTombstone.Value))
        .count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      Thread.sleep(500)
      println(f"[cap-scale] $docs%9d identical docs -> $rows index rows " +
        f"($tomb tombstones): wall $wall%6.2f s, shuffle write records " +
        f"${stats.shuffleRecords.get}%d (band rows would be ${docs * 32}%d)")
      stats.report("cap-scale")
    } finally spark.sparkContext.removeSparkListener(stats)
    spark.stop()
  }
}
