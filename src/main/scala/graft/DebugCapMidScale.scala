package graft

import org.apache.spark.sql.functions._

import graft.core.Sessions

/**
 * Dev-only: the capped aggregate's MIDDLE-ZONE audit (VERDICT r14 task
 * 3). [[DebugCapScale]] measures the map-side overflow (a partial that
 * crosses the cap ships a constant-size marker); the documented
 * remaining shape is a hot bucket spread so THIN that no single partial
 * overflows — every map task ships its ≤cap members and ONE reducer
 * task receives up to partitions × cap entries for that key, discarding
 * them the moment the merged buffer crosses the cap
 * ([[graft.core.BoundedCollectBuf]] memory stays ≤ cap+1 throughout;
 * the cost under audit is pure shuffle TRANSPORT + deserialize on one
 * task). This pins the zone with two tiers over the SAME corpus:
 *
 *  - middle zone: `partials` map partitions × exactly-at-cap rows per
 *    partition of every hot bucket (cap = docs/partials — no partial
 *    overflows); the merge stage's max task and the exchange's bytes
 *    are the numbers of record, extrapolated per-entry to the 10k×4096
 *    corpus-scale worst case in BASELINE.md;
 *  - map-overflow contrast: same docs, cap = half the per-partition
 *    count — every partial overflows map-side and the exchange carries
 *    only constant-size markers (the DebugCapScale regime), bounding
 *    what the middle zone costs OVER the best case.
 *
 * Usage: runMain graft.DebugCapMidScale [partials=1024] [capRows=512]
 */
object DebugCapMidScale {
  def main(args: Array[String]): Unit = {
    val partials = args.headOption.map(_.toInt).getOrElse(1024)
    val perPartition = args.lift(1).map(_.toInt).getOrElse(512)
    val docs = partials.toLong * perPartition
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The zone is defined by the PARTIAL count of the bucket aggregation,
    // which is the upstream shuffle's reducer count (the shingle/minhash
    // groupBys re-partition the corpus before banding): force `partials`
    // reducer partitions and pin them against AQE coalescing, else every
    // run collapses to 32 map partials and overflows map-side regardless
    // of spread (the first cut of this audit measured exactly that).
    spark.conf.set("spark.sql.shuffle.partitions", partials.toString)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val sharedText = (1 to 40).map(i => s"boilerplate${i % 7} clause$i shared").mkString(" ")
    val corpus = spark.range(docs)
      .repartition(partials)
      .select(col("id").as("doc_id"), lit(sharedText).as("text"))
      .localCheckpoint(true)

    val stats = new StageStats("cap-mid")
    spark.sparkContext.addSparkListener(stats)
    try {
      for ((label, cap) <- Seq(
          // hash spread puts ~perPartition ±√ docs in each partial; a cap
          // 25% above that keeps (virtually) every partial UNDER it — the
          // pure middle zone: full buffers ship, the reducer discards
          ("middle zone (under-cap partials)", perPartition + perPartition / 4),
          ("map-overflow contrast", perPartition / 2))) {
        stats.reset()
        spark.sparkContext.setJobGroup(s"cap-mid-$label", label)
        val t0 = System.nanoTime()
        val built = operators.Dedup.bandIndexKv(corpus, "doc_id", "text", maxBucket = cap)
        // touch `value` in BOTH actions: a bare count() lets Catalyst
        // prune the unused bounded_collect out of the Aggregate, and the
        // exchange under audit vanishes from that action's metrics
        val rows = built.where(col("value").isNotNull).count()
        val tomb = built.where(
          graft.functions.bytes_utf8(col("value")) === lit(graft.core.IndexTombstone.Value))
          .count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        Thread.sleep(500)
        println(f"[cap-mid] $label%-30s cap=$cap%5d docs=$docs%8d -> $rows rows " +
          f"($tomb tombstones): wall $wall%6.2f s, " +
          f"shuffle ${stats.shuffleRecords.get}%d records / " +
          f"${stats.shuffleBytes.get / (1024 * 1024)}%d MB")
        stats.report("cap-mid", top = 8)
      }
    } finally spark.sparkContext.removeSparkListener(stats)
    spark.stop()
  }
}
