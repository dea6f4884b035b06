package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Input-size guard for the exact/audit formulations (all-pairs Jaccard,
 * exhaustive cosine, exhaustive SimHash, brute-force top-k): each is
 * deliberately quadratic and meant for samples/audits, and each has a
 * banded/bucketed scale twin in this package. Documentation alone does not
 * bound anything — a caller can hand the audit path a full corpus and melt
 * a cluster — so every audit operator counts its input through a bounded
 * `limit(max + 1)` probe (never materializing more than max + 1 rows) and
 * throws past the cap, naming the scale twin. The cap is a parameter:
 * raising it is a deliberate act at the call site, not a silent default.
 */
private[graft] object LshBuckets {

  /** Default per-bucket member cap for LSH band/bucket self-joins. A
    * bucket with b members contributes b^2/2 candidate pairs INSIDE ONE
    * JOIN TASK (same key = same task): on boilerplate-heavy corpora a
    * degenerate bucket with 100k near-identical docs is a 5-billion-pair
    * straggler that no amount of cluster buys back. 4096 bounds any
    * single bucket to ~8M pairs — heavy but finite — while sitting far
    * above the bucket sizes any honest near-dup cluster produces at the
    * fixture scales the oracles verify. */
  val MaxBucket: Int = 4096

  /** Rows whose bucket (the `keys` tuple) holds at most `maxBucket`
    * members; oversized buckets are DROPPED whole. One window count over
    * the bucket key — the same hash partitioning the downstream self-join
    * shuffles on, so the exchange is shared, not added. `_bsz` is a
    * reserved name: the window count rides it internally, and silently
    * replacing-then-dropping a caller's own `_bsz` column on the public
    * entry points (lshCandidates, simHashPairsBanded, bandIndexKv) would
    * lose user data — so its presence fails loud, same convention as
    * dedupAgainstIndex's reserved-column guard.
    *
    * `failOversized = true` turns the drop into an in-plan
    * `raise_error` naming the cap — for callers whose ORACLE cannot
    * replay the drop (the MinHash banding rides xxhash64, which no SQL
    * replay can express): the contract then either matches its oracle
    * exactly or fails loudly, never silently diverges (the
    * dedup_shared_substring class, ADVICE r10). Same plan shape — the
    * raise rides the window count the filter would have used. */
  def bounded(
      df: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      maxBucket: Int,
      failOversized: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    require(!df.columns.contains("_bsz"),
      "input carries the reserved column name `_bsz` (used internally for " +
        "the bucket-size window count) — rename or drop it before calling")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, concat, count, lit, raise_error, when}
    val w = Window.partitionBy(keys.map(col): _*)
    val counted = df.withColumn("_bsz", count(lit(1)).over(w))
    val capped =
      if (!failOversized) counted.where(col("_bsz") <= maxBucket)
      else counted.where(
        when(col("_bsz") <= maxBucket, lit(true)).otherwise(raise_error(concat(
          lit(s"bucket (${keys.mkString(", ")}) exceeds the hot-bucket cap $maxBucket with "),
          col("_bsz").cast("string"),
          lit(" members — this caller's oracle cannot replay the drop; " +
            "inspect with oversizedLshBuckets, then dedup the degenerate " +
            "cluster (exact dedup / boilerplate removal) or use the " +
            "dropping variant explicitly")))))
    capped.drop("_bsz")
  }

  /** [[bounded]]'s split twin for the PUBLISHED index families: (rows of
    * within-cap buckets, DISTINCT keys of oversized buckets). The second
    * frame becomes [[graft.core.IndexTombstone]] rows — oversized members
    * are still dropped BEFORE any collect_list (the value-cell bound),
    * but the bucket's key survives so incremental upserts can keep it
    * dropped. Both frames derive from the one window-counted subplan
    * (same partitioning; ReuseExchange dedups the exchange), and the
    * distinct on oversized keys re-uses that clustering. */
  def boundedSplit(
      df: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      maxBucket: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    require(!df.columns.contains("_bsz"),
      "input carries the reserved column name `_bsz` (used internally for " +
        "the bucket-size window count) — rename or drop it before calling")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, count, lit}
    val w = Window.partitionBy(keys.map(col): _*)
    val counted = df.withColumn("_bsz", count(lit(1)).over(w))
    (counted.where(col("_bsz") <= maxBucket).drop("_bsz"),
      counted.where(col("_bsz") > maxBucket).select(keys.map(col): _*).distinct())
  }
}

private[operators] object AuditBound {

  /** Default cap for the O(N^2)-pair audit operators. */
  val MaxAuditRows: Long = 100000L

  /** Default cap for the brute-force top-k corpus side (O(Q x N) — linear
    * per query, so a larger corpus is tolerable, but a 100 TB corpus still
    * must take the ANN path). */
  val MaxBruteForceCorpusRows: Long = 1000000L

  /** Throws unless `df` has at most `maxRows` rows. One bounded action:
    * `limit(maxRows + 1).count()` short-circuits the scan and proves
    * "too big" without counting the full input. The probe rides `limit`,
    * which takes an Int — a larger cap would be silently tightened, so
    * it is rejected loudly instead (an audit sample past 2 billion rows
    * is not an audit). */
  def check(df: DataFrame, maxRows: Long, op: String, scaleTwin: String): Unit = {
    require(maxRows >= 0 && maxRows < Int.MaxValue,
      s"$op: maxRows must be in [0, ${Int.MaxValue - 1}], got $maxRows")
    val lim = maxRows.toInt
    val n = df.limit(lim + 1).count()
    if (n > lim) throw new IllegalArgumentException(
      s"$op is the exact audit formulation and was handed > $lim input rows; " +
        s"it is quadratic at corpus scale — use $scaleTwin for full corpora, " +
        "or raise maxRows deliberately for a larger audit sample")
  }
}
