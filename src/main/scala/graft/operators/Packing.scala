package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
 * take per-partition token totals (one row per partition — safe to
 * collect at any scale), then a single in-partition running-sum pass
 * seeded with each partition's cumulative offset. No single-partition
 * global window anywhere: the classic `sum() over (order by id)`
 * formulation funnels the whole corpus through ONE task, which is
 * exactly the plan that cannot survive 100 TB. The running-sum pass is
 * `mapPartitions` (genuine per-partition imperative logic — a prefix
 * sum), not a `Window partitionBy(partition_id)`, which would re-shuffle
 * and re-sort data that is already ordered because Catalyst cannot see
 * that range partitions cluster the partition id.
 *
 * Both phases evaluate the same range-shuffled plan, so the input's
 * partitioning must be deterministic across jobs (true for file scans
 * and deterministic transforms; Spark's round-robin repartition sorts
 * for exactly this reason).
 */
object Packing {

  /**
   * Per-document chunk spans under `budget`-token chunks, ordered by
   * `idCol` (must be long-typed). `tokensCol` is evaluated per row (e.g.
   * [[TextAnalysis.wsTokenCount]]); zero-token documents are excluded —
   * they occupy no tokens, so "the chunk they fall in" is ill-defined.
   *
   * Output: idCol, n_tokens, first_chunk, last_chunk (all long;
   * inclusive chunk ids; pure long math throughout — a double round-trip
   * would lose exactness past 2^53 total tokens, a realistic corpus).
   */
  def chunkSpans(
      df: DataFrame,
      idCol: String,
      tokensCol: org.apache.spark.sql.Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"chunkSpans: budget must be >= 1, got $budget")
    val spark = df.sparkSession
    // Eagerly materialize the range-shuffled layout ONCE and run both
    // phases against it. Without this, phase 1 and phase 2 are separate
    // jobs that each re-sample range boundaries, and RangePartitioner's
    // reservoir sampling is seeded per job — identical only while every
    // partition fits the reservoir (~300 rows); at real scale the two
    // jobs pick different boundaries and the offsets seeding breaks.
    // The checkpoint holds (id, n_tokens) = 16 bytes/row, not the text —
    // ~160 GB cluster-wide for 10^10 docs, a fair price for a correct
    // global order. No cache leak: unpersisting is the caller-visible
    // result's problem only until this method returns (the returned plan
    // reads the checkpoint blocks; they are freed with the DataFrame).
    val ordered = df
      .select(col(idCol).cast("long").as(idCol), tokensCol.cast("long").as("n_tokens"))
      // null ids are excluded like zero-token docs (a doc with no
      // position in the id order has no chunk span) — without this the
      // range shuffle sorts them FIRST, phase 1's min(id) skips them,
      // and phase 2's head-row seed NPEs opaquely on the executor
      .where(col(idCol).isNotNull && col("n_tokens") > 0)
      .repartitionByRange(spark.sparkContext.defaultParallelism, col(idCol))
      .sortWithinPartitions(col(idCol))
      .localCheckpoint(true)
    // Phase 1: per-partition (first id, token total). Offsets are keyed
    // by each range partition's FIRST DOCUMENT ID, never by a
    // partition-id notion: a downstream narrow coalesce (e.g. a caller's
    // `.coalesce(1).write`) merges several data partitions into one TASK,
    // so `TaskContext.getPartitionId()` in phase 2 would not name the
    // data partition being computed — the classic seeded-prefix-sum trap.
    // The per-parent-partition `mapPartitions` invocation survives a
    // coalesce (CoalescedRDD concatenates parent iterators), and its
    // first row's id identifies the partition in any task layout.
    val parts = ordered
      .groupBy(spark_partition_id().as("_pid"))
      .agg(min(col(idCol)).as("_minId"), sum(col("n_tokens")).as("_ptotal"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    val offsets: Map[Long, Long] =
      parts.map(_._1).zip(parts.map(_._2).scanLeft(0L)(_ + _).init).toMap
    // Phase 2: seeded running sum, one narrow pass, no extra shuffle.
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("first_chunk", LongType, nullable = false),
      StructField("last_chunk", LongType, nullable = false)))
    ordered.mapPartitions { it0 =>
      val it = it0.buffered
      if (!it.hasNext) Iterator.empty
      else {
        val firstId = it.head.getLong(0)
        // loud failure beats silently mis-seeded chunk ids if the two
        // phases ever see different partitionings
        var cum = offsets.getOrElse(firstId,
          throw new IllegalStateException(
            s"chunkSpans: no offset for partition starting at id $firstId — " +
              "phase 1 and phase 2 saw different range partitionings"))
        it.map { r =>
          val t = r.getLong(1)
          cum += t
          // operands non-negative, so Long division == floor division
          Row(r.getLong(0), t, (cum - t) / budget, (cum - 1) / budget)
        }
      }
    }(Encoders.row(schema))
  }

  /** Corpus-level packing summary on top of [[chunkSpans]]: total chunk
    * count, how many documents straddle a chunk boundary — the
    * packing-efficiency dashboard numbers. */
  def packingStats(spans: DataFrame): DataFrame =
    spans.agg(
      count(lit(1)).as("n_docs"),
      // coalesce: an empty corpus reports zeros, not a row of nulls
      coalesce(sum(col("n_tokens")), lit(0L)).as("total_tokens"),
      coalesce(max(col("last_chunk")) + 1L, lit(0L)).as("n_chunks"),
      coalesce(
        sum(when(col("last_chunk") > col("first_chunk"), 1L).otherwise(0L)),
        lit(0L)).as("straddling_docs"))
}
