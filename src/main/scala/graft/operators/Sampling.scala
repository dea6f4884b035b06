package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.md5_prefix32

/**
 * Deterministic sampling and dataset splitting for training-data
 * pipelines. Membership is a pure function of the id — no RNG, no
 * row-position dependence — so splits are reproducible across runs,
 * cluster sizes, and engines, and a document keeps its split assignment
 * when the corpus is re-processed (the property leakage audits depend on).
 *
 * The bucket hash is the first 8 hex chars of md5 of the id's decimal
 * string ([[graft.functions.md5_prefix32]]): exactly replicable in any
 * engine with md5 (the DuckDB oracle replays it), unlike Spark-specific
 * xxhash64/Murmur3. Rows with a null id are dropped by both [[sample]]
 * and [[split]] — a null can't have a stable assignment.
 */
object Sampling {

  /** Stable bucket in [0, buckets) from an id column. */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    pmod(md5_prefix32(id.cast("string")), lit(buckets.toLong))
  }

  /** Deterministic fraction sample: keeps ids whose bucket (out of 10000)
    * falls below round(fraction * 10000) — stable under reprocessing, and
    * rounded so 0.29 means bucket < 2900, not a double-truncated 2899. */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.where(hashBucket(col(idCol), 10000) < math.round(fraction * 10000))
  }

  /**
   * Split a dataset by per-mille weights: `split(df, "id", Seq("train" ->
   * 980, "valid" -> 10, "test" -> 10))` — weights must sum to 1000. Adds a
   * `split` column; every surviving row lands in exactly one split,
   * assignments are disjoint and exhaustive by construction.
   */
  def split(df: DataFrame, idCol: String, weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 1000, "split weights must sum to 1000 (per-mille)")
    require(weights.forall(_._2 > 0), "every split needs positive weight")
    val bucket = hashBucket(col(idCol), 1000)
    val bounds = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val expr = weights.zip(bounds).foldRight(lit(weights.last._1): Column) {
      case (((name, _), upper), elseCol) =>
        when(bucket < upper, lit(name)).otherwise(elseCol)
    }
    df.where(col(idCol).isNotNull).withColumn("split", expr)
  }

  /**
   * Stratified deterministic sampling: keep each row with a per-stratum
   * per-mille rate (`rates`, with `defaultRate` for unlisted strata) —
   * how a training mix is rebalanced (e.g. downsample boilerplate-heavy
   * strata, keep all of a rare language). Same md5 bucket as [[sample]],
   * so membership stays a pure function of the id: re-stratifying does
   * not reshuffle which ids survive within an unchanged stratum, and a
   * stratum's kept set at rate r is a SUBSET of its kept set at rate
   * r' > r (nested samples — rate changes only add/remove the margin).
   * Per-row filter, no shuffle.
   */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: Column,
      rates: Seq[(String, Int)],
      defaultRate: Int): DataFrame = {
    require(rates.forall { case (_, r) => r >= 0 && r <= 1000 },
      "per-stratum rates are per-mille: 0..1000")
    require(defaultRate >= 0 && defaultRate <= 1000, "defaultRate is per-mille: 0..1000")
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((name, r), elseCol) => when(stratumCol === name, lit(r)).otherwise(elseCol)
    }
    df.where(col(idCol).isNotNull && hashBucket(col(idCol), 1000) < rate)
  }

  /**
   * Per-source keep rates (per-mille) that hit a token-budget mix: given
   * target per-mille `weights` over sources and a total `budgetTokens`,
   * each source's rate is chosen so its expected kept tokens ≈ its share
   * of the budget, capped at "keep everything" when the source has fewer
   * tokens than its target (the under-resourced-language case — you can't
   * sample what isn't there; the mix then under-fills rather than
   * over-sampling other sources, which would silently change the recipe).
   *
   * All arithmetic is Long floor division so the DuckDB oracle replays it
   * bit-for-bit. One partial-agg shuffle of (#sources) rows — scale-free.
   */
  def tokenBudgetRates(
      df: DataFrame,
      sourceCol: String,
      tokensCol: Column,
      weights: Seq[(String, Int)],
      budgetTokens: Long): Seq[(String, Int)] = {
    require(weights.map(_._2).sum == 1000, "mix weights must sum to 1000 (per-mille)")
    require(weights.forall(_._2 > 0), "every source in the mix needs positive weight")
    require(budgetTokens > 0 && budgetTokens < Long.MaxValue / 1000,
      s"budgetTokens out of range: $budgetTokens")
    val wanted = weights.map(_._1)
    val avail: Map[String, Long] = df
      .where(col(sourceCol).isin(wanted: _*))
      .groupBy(col(sourceCol))
      .agg(sum(tokensCol.cast("long")).as("a"))
      .collect()
      // an all-null token column sums to a NULL aggregate: that source
      // has 0 known tokens (rate 0), not a driver NPE
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    weights.map { case (src, w) =>
      val target = w.toLong * budgetTokens / 1000L
      val a = avail.getOrElse(src, 0L)
      val rate = if (a <= 0L) 0L else math.min(1000L, 1000L * target / a)
      src -> rate.toInt
    }
  }

  /** Deterministic corpus mixing to a token budget: sources sampled at
    * [[tokenBudgetRates]], everything else dropped (defaultRate 0) — the
    * "data recipe" step of a pretraining pipeline (sample each corpus to
    * its target token share). Same md5 buckets as [[sample]], so a doc's
    * membership survives reprocessing and a budget increase only ADDS
    * documents (rates are monotone in the budget, kept sets nest). */
  def tokenBudgetMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokensCol: Column,
      weights: Seq[(String, Int)],
      budgetTokens: Long): DataFrame =
    stratifiedSample(
      df, idCol, col(sourceCol),
      tokenBudgetRates(df, sourceCol, tokensCol, weights, budgetTokens),
      defaultRate = 0)

  /** IEEE integer square root: `floor(ieee_sqrt(double(x)))`. This is a
    * DEFINED deterministic function, not mathematical isqrt — IEEE-754
    * requires sqrt correctly rounded and BIGINT→DOUBLE conversion rounds
    * identically in every engine, so `floor(sqrt(n))` replays bit-for-bit
    * in DuckDB/Spark/anything IEEE (the quantized-integer oracle
    * contract). For n < 2^52 it equals true isqrt anyway. */
  def ieeeIsqrt(x: Long): Long = {
    require(x >= 0, s"ieeeIsqrt of negative $x")
    math.floor(math.sqrt(x.toDouble)).toLong
  }

  /** Per-source per-mille rates for [[alphaMix]] — temperature-weighted
    * source rebalancing (the multilingual α-sampling of XLM-R /
    * mBERT-style pipelines): source s is sampled toward a share ∝ n_s^α,
    * α = 1/2^halfPow, flattening the source distribution so big corpora
    * stop drowning small ones.
    *
    *  - halfPow = 0: α=1, proportional (no rebalancing);
    *  - halfPow = 1: α=1/2, the classic temperature;
    *  - halfPow = 2: α=1/4, more aggressive flattening.
    *
    * All integer math: weight_s = ieeeIsqrt applied halfPow times to the
    * source's row count, target_s = budgetRows·w_s / Σw (floor), rate_s =
    * min(1000, 1000·target_s / n_s) — every step replayable in SQL. The
    * per-source counts are one aggregation; only #sources rows reach the
    * driver. */
  def alphaRates(
      df: DataFrame,
      sourceCol: String,
      budgetRows: Long,
      halfPow: Int): Seq[(String, Int)] = {
    require(halfPow >= 0 && halfPow <= 3, s"halfPow must be in [0,3], got $halfPow")
    require(budgetRows > 0, s"budgetRows must be positive, got $budgetRows")
    val counts: Seq[(String, Long)] = df
      // a null-source row can never be selected by a per-source rate
      // (stratifiedSample joins on the source value), so it is excluded
      // from the census too — and a null key would NPE the sortBy below
      .where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    counts.foreach { case (_, n) =>
      require(n < Long.MaxValue / 1000 && budgetRows < Long.MaxValue / math.max(n, 1L),
        "source count x budget overflows the integer rate math")
    }
    val weights = counts.map { case (s, n) =>
      s -> (0 until halfPow).foldLeft(n)((acc, _) => ieeeIsqrt(acc))
    }
    val totalW = weights.map(_._2).sum
    counts.sortBy(_._1).map { case (s, n) =>
      val w = weights.find(_._1 == s).get._2
      val target = if (totalW == 0) 0L else w * budgetRows / totalW
      // the per-source requires above bound n*1000 and n*budget, but
      // target can reach budgetRows itself (one tiny source, huge
      // budget): clamp the 1000x rate step the same way — a wrapped
      // negative rate would read as "select nothing", silent data loss
      require(target < Long.MaxValue / 1000,
        s"alphaRates: target rows for source '$s' overflow the per-mille rate math " +
          s"(target=$target) — lower budgetRows")
      val rate = if (n <= 0) 0L else math.min(1000L, 1000L * target / n)
      s -> rate.toInt
    }
  }

  /** Temperature-rebalanced deterministic sample to a row budget (see
    * [[alphaRates]]) — same md5 buckets as [[sample]], so membership
    * survives reprocessing and nests as the budget grows. */
  def alphaMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      budgetRows: Long,
      halfPow: Int = 1): DataFrame =
    stratifiedSample(
      df, idCol, col(sourceCol),
      alphaRates(df, sourceCol, budgetRows, halfPow),
      defaultRate = 0)

  /**
   * Deterministic global shuffle — the epoch-reshuffle step of a training
   * pipeline: every row gets an exact position in a seed-keyed permutation
   * of the whole corpus (same seed ⇒ same order on any cluster size; new
   * epoch = new seed). Order is by `md5(seed:id)` with the id as
   * tiebreak — at corpus scale the 32-bit hash WILL collide (birthday at
   * ~2^16 rows), so the tiebreak is correctness, not pedantry.
   *
   * The position is simply the global rank under (hash, id) —
   * [[Ranking.globalRank]]'s two-phase distributed prefix sum, never the
   * single-partition `row_number() over (order by …)` window that funnels
   * 100 TB through one task.
   *
   * Output: idCol (long), pos (long, dense 0..n-1). Null ids are dropped
   * (no stable position). ~16 bytes/row through the one range shuffle.
   */
  def globalShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame = {
    // The id must already be integral: a silent cast("long") on, say,
    // string ids would null every row and return an EMPTY permutation —
    // total silent data loss in a training pipeline. Fail loud instead.
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"globalShuffle: id column '$idCol' must be an integral type, got " +
          s"${other.simpleString} — hash your native id into a long first")
    }
    // The permutation position IS a global rank under (seed-hash, id):
    // one shared prefix-sum skeleton (Ranking) instead of a second copy.
    // (Duplicate ids get arbitrary relative order — range partitioning
    // routes equal keys to one partition, so they can't corrupt offsets,
    // but an epoch shuffle over non-unique ids is a caller bug.)
    val keyed = df
      .select(col(idCol).cast("long").as(idCol))
      .where(col(idCol).isNotNull)
      .withColumn("_sk",
        md5_prefix32(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))))
    Ranking.globalRank(keyed, Seq("_sk", idCol))
      .select(col(idCol), col("rank").as("pos"))
  }
}
