package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM training: concatenate the corpus in a
 * deterministic document order and cut it into fixed-size token chunks
 * ("concat-and-chunk" — the standard pretraining batch layout). Each
 * document maps to the half-open chunk span it lands in; a document
 * longer than the budget spans several chunks, several short documents
 * share one.
 *
 * Scale shape: the global running token total is computed with a
 * two-phase distributed prefix sum — range-partition by the order key,
 * cumulative-sum *within* each partition under a per-partition window,
 * then add the (tiny, collected and broadcast-joined) per-partition
 * offsets. No single-partition global window anywhere: the classic
 * `sum() over (order by id)` formulation funnels the whole corpus
 * through ONE task, which is exactly the plan that cannot survive 100 TB.
 * Cost: one range shuffle + one row-count-per-partition collect.
 */
object Packing {

  /**
   * Per-document chunk spans under `budget`-token chunks, ordered by
   * `idCol`. `tokensCol` is evaluated per row (e.g.
   * [[TextAnalysis.wsTokenCount]]); zero-token documents are excluded —
   * they occupy no tokens, so "the chunk they fall in" is ill-defined.
   *
   * Output: idCol, n_tokens, first_chunk, last_chunk (all long;
   * inclusive chunk ids; integer math throughout so any engine agrees).
   */
  def chunkSpans(
      df: DataFrame,
      idCol: String,
      tokensCol: org.apache.spark.sql.Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"chunkSpans: budget must be >= 1, got $budget")
    val spark = df.sparkSession
    val base = df
      .select(col(idCol), tokensCol.cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .repartitionByRange(spark.sparkContext.defaultParallelism, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("_pid", spark_partition_id())
    // Phase 1: per-partition totals — one row per partition, safe to
    // collect at any scale (bounded by the partition count, not the data).
    val totals = base.groupBy(col("_pid")).agg(sum(col("n_tokens")).as("_ptotal"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + totals(p)).init).toMap
    val offsetDf = spark.createDataFrame(
      offsets.toSeq.map { case (p, o) => (p, o) }).toDF("_pid", "_offset")
    // Phase 2: in-partition running sum + broadcast offset = global prefix.
    val w = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("_local_cum", sum(col("n_tokens")).over(w))
      .join(broadcast(offsetDf), "_pid")
      .withColumn("_cum", col("_local_cum") + col("_offset"))
      .select(
        col(idCol),
        col("n_tokens"),
        // integral `div`, not `/` + floor (which round-trips through
        // double and loses exactness past 2^53 tokens — a realistic
        // corpus size): the chunk holding the doc's first / last token.
        expr(s"(_cum - n_tokens) div ${budget}L").as("first_chunk"),
        expr(s"(_cum - 1L) div ${budget}L").as("last_chunk"))
  }

  /** Corpus-level packing summary on top of [[chunkSpans]]: total chunk
    * count, how many documents straddle a chunk boundary, and mean docs
    * per chunk — the packing-efficiency dashboard numbers. */
  def packingStats(spans: DataFrame, budget: Long): DataFrame =
    spans.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      (max(col("last_chunk")) + 1L).as("n_chunks"),
      sum(when(col("last_chunk") > col("first_chunk"), 1L).otherwise(0L))
        .as("straddling_docs"))
}
