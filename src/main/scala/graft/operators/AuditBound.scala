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

  /** The DISTINCT oversized bucket keys of a key-partitioned frame,
    * with their counts (`_bsz`): a hash aggregate that runs DIRECTLY on
    * [[keyPartitioned]]'s exchange output (the partitioning already
    * satisfies the grouping, so no second exchange and no re-derivation
    * of the upstream pipeline), counting even a hot bucket's rows
    * linearly — where the previous window-count formulation routed ALL
    * of a hot bucket's rows through ONE WindowExec SORT before
    * discarding them (the cap mechanism itself straggled at exactly the
    * scale it defends against). The result is tiny by construction: at
    * most rows/maxBucket keys can be oversized. */
  private def oversizedKeys(
      shuffled: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      maxBucket: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    shuffled.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_bsz"))
      .where(col("_bsz") > maxBucket)
  }

  /** ONE key-partitioned MATERIALIZATION of the bucket frame, shared by
    * every consumer of the capped frame: the oversized-key count, the
    * drop/raise probe, and the caller's downstream self-join on the same
    * keys all read its blocks.
    *
    * Why an eager localCheckpoint and not exchange reuse (optimization
    * r16, measured): AQE stage reuse does NOT compose transitively —
    * once a shared upstream exchange is wrapped in per-consumer
    * ReusedQueryStage instances, the DOWNSTREAM identical exchanges no
    * longer canonicalize equal and each consumer re-executes the whole
    * upstream map stage (minhash signatures, anchor fingerprints, band
    * projections…). Job-group stage stats on dedup_minhash showed the
    * band exchange's map stage (signature aggregation included) running
    * TWICE — with broadcasts disabled too, so it is not a broadcast
    * artifact. The checkpoint stores the same bytes the exchange's
    * shuffle files already held (MEMORY_AND_DISK, ContextCleaner-reaped
    * when the caller drops the result frame — the
    * removeSharedSpansIterated block-ownership precedent), and the
    * upstream pipeline provably computes once. LogicalRDD preserves the
    * hash partitioning, so the downstream groupBy/self-join on the keys
    * still plans exchange-free.
    *
    * FAULT-TOLERANCE TRADE (ADVICE r16): localCheckpoint blocks are
    * single-replica and lineage-free by design — on a multi-executor
    * cluster a lost executor fails every downstream action of the
    * returned frame instead of recomputing (acceptable in the local[*]
    * harness and for job-scoped frames like these, whose consumers all
    * run within the same operator call; a retry re-runs the operator).
    * Cluster deployments that want recomputation back set
    * `spark.checkpoint.compress=true` + a reliable `checkpoint()` dir,
    * or accept the operator-level retry — the per-consumer duplicate
    * EXECUTION this seam removes costs more than the retry exposure at
    * every scale measured. */
  private def keyPartitioned(
      df: org.apache.spark.sql.DataFrame,
      keys: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    df.repartition(keys.map(col): _*).localCheckpoint(true)
  }

  /** Left-anti of `df` against the (tiny, BROADCAST — a shuffled anti
    * would re-route the hot bucket through one sort task) oversized key
    * set; null-safe equality so a null-keyed bucket drops exactly as the
    * count grouped it. Broadcast size is bounded in practice by
    * rows/maxBucket keys AND by Spark's own broadcast-table ceiling
    * (BroadcastExchange fails LOUD past it — a corpus degenerate enough
    * to oversize hundreds of millions of buckets is not a capping
    * problem). */
  private def dropKeys(
      df: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      oversized: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val ov = oversized.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"_ov$i") }: _*)
    val cond = keys.zipWithIndex
      .map { case (k, i) => df(k) <=> ov(s"_ov$i") }
      .reduce(_ && _)
    df.join(broadcast(ov), cond, "left_anti")
  }

  /** Rows whose bucket (the `keys` tuple) holds at most `maxBucket`
    * members; oversized buckets are DROPPED whole — their rows removed
    * MAP-SIDE by a broadcast anti-join against the (tiny) oversized key
    * set, before any downstream exchange ever carries them. `_bsz` is a
    * reserved name (rides the count internally); a caller's own `_bsz`
    * column fails loud, same convention as dedupAgainstIndex's
    * reserved-column guard.
    *
    * `failOversized = true` turns the drop into an in-plan
    * `raise_error` naming the cap and the observed count — for callers
    * whose ORACLE cannot replay the drop (the MinHash banding rides
    * xxhash64, which no SQL replay can express): the contract then
    * either matches its oracle exactly or fails loudly, never silently
    * diverges (the dedup_shared_substring class, ADVICE r10). */
  def bounded(
      df: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      maxBucket: Int,
      failOversized: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    require(!df.columns.exists(c => c == "_bsz" || c.startsWith("_ov")),
      "input carries a reserved column name (`_bsz` or `_ov*`, used " +
        "internally for the bucket-size count and the oversized-key join) " +
        "— rename or drop it before calling")
    import org.apache.spark.sql.functions.{broadcast, col, concat, lit, raise_error, when}
    val shuffled = keyPartitioned(df, keys)
    val oversized = oversizedKeys(shuffled, keys, maxBucket)
    if (!failOversized) dropKeys(shuffled, keys, oversized)
    else {
      // left join against the oversized set: a matched row means its
      // bucket crossed the cap — raise with the count, else pass through
      val ov = oversized.select(
        keys.zipWithIndex.map { case (k, i) => col(k).as(s"_ov$i") } :+ col("_bsz"): _*)
      val cond = keys.zipWithIndex
        .map { case (k, i) => shuffled(k) <=> ov(s"_ov$i") }
        .reduce(_ && _)
      shuffled.join(broadcast(ov), cond, "left")
        .where(when(col("_bsz").isNull, lit(true)).otherwise(raise_error(concat(
          lit(s"bucket (${keys.mkString(", ")}) exceeds the hot-bucket cap $maxBucket with "),
          col("_bsz").cast("string"),
          lit(" members — this caller's oracle cannot replay the drop; " +
            "inspect with oversizedLshBuckets, then dedup the degenerate " +
            "cluster (exact dedup / boilerplate removal) or use the " +
            "dropping variant explicitly")))))
        .drop((keys.indices.map(i => s"_ov$i") :+ "_bsz"): _*)
    }
  }

  /** ONE-PASS capped member collection for the PUBLISHED index families
    * and the posting-list builds — the [[graft.core.BoundedCollectAgg]]
    * fusion of the retired count-first split + the downstream
    * `sort_array(collect_list(...))`: per bucket key, the exact member
    * count `_n` and the sorted member payloads `_members`
    * (NULL = crossed the cap → the caller publishes the
    * [[graft.core.IndexTombstone]] / `x:` record, with `_n` as the
    * published count where the grammar wants one). ONE exchange whose
    * partial buffers are capped at `maxBucket + 1` entries — a hot
    * bucket overflows MAP-SIDE and ships a constant-size marker, so the
    * exchange never carries its rows (the count-first layout still
    * repartitioned every hot row into one shuffle partition to count it
    * there), and the counts pass + broadcast anti-join disappear with
    * their toy-scale stage cost (BASELINE.md round-13's declared
    * +0.8–1.0 s/query).
    *
    * `sortKeyCol` picks the family's canonical member order (the payload
    * itself for the string-sorted band families; the numeric doc id for
    * the posting lists); ties break on payload bytes. Output columns:
    * the `keys` columns + `_n` (bigint) + `_members`
    * (array&lt;string&gt;, null past the cap). */
  def boundedMembers(
      df: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      sortKeyCol: org.apache.spark.sql.Column,
      payloadCol: org.apache.spark.sql.Column,
      maxBucket: Int,
      // ANN posting-list semantics: dedupe members by payload inside the
      // capped buffer (re-ingested identical entries collapse; the cap
      // applies to DISTINCT members, `_n` is a lower bound past it)
      distinctMembers: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    require(!df.columns.exists(c => c == "_bc" || c == "_n" || c == "_members"),
      "input carries a reserved column name (`_bc`/`_n`/`_members`, used " +
        "internally by the capped member collection) — rename or drop it " +
        "before calling")
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.interop
    df.groupBy(keys.map(col): _*)
      .agg(interop.column(graft.core.BoundedCollectAgg(
          interop.expression(sortKeyCol),
          interop.expression(payloadCol),
          maxBucket,
          distinctMembers).toAggregateExpression()).as("_bc"))
      .select(keys.map(col) ++ Seq(
        col("_bc.n").as("_n"), col("_bc.members").as("_members")): _*)
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
