package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
