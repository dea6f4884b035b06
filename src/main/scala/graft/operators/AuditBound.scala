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
private[operators] object AuditBound {

  /** Default cap for the O(N^2)-pair audit operators. */
  val MaxAuditRows: Long = 100000L

  /** Default cap for the brute-force top-k corpus side (O(Q x N) — linear
    * per query, so a larger corpus is tolerable, but a 100 TB corpus still
    * must take the ANN path). */
  val MaxBruteForceCorpusRows: Long = 1000000L

  /** Throws unless `df` has at most `maxRows` rows. One bounded action:
    * `limit(maxRows + 1).count()` short-circuits the scan and proves
    * "too big" without counting the full input. */
  def check(df: DataFrame, maxRows: Long, op: String, scaleTwin: String): Unit = {
    require(maxRows >= 0, s"$op: maxRows must be >= 0, got $maxRows")
    val lim = math.min(maxRows, Int.MaxValue - 1L).toInt
    val n = df.limit(lim + 1).count()
    if (n > lim) throw new IllegalArgumentException(
      s"$op is the exact audit formulation and was handed > $lim input rows; " +
        s"it is quadratic at corpus scale — use $scaleTwin for full corpora, " +
        "or raise maxRows deliberately for a larger audit sample")
  }
}
