package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream operators (batch forms; graft.streaming hosts the
 * Structured-Streaming twins).
 *
 * Convention: the `ts` column is **nanoseconds since epoch as BIGINT**
 * (Spark has no nanosecond timestamp type; parquet TIMESTAMP(NANOS) is
 * read via spark.sql.legacy.parquet.nanosAsLong). All window/gap math is
 * integer nanoseconds — exact, overflow-free until year 2262, and
 * bit-identical in any engine. Money sums use integer cents for the same
 * reason.
 */
object Events {

  def cents(c: Column): Column = round(c * 100).cast("long")

  private val NanosPerSecond = 1000000000L

  /** Tumbling-window aggregation: epoch-aligned windows, counts + exact
    * sums per (window, event_type). */
  def windowAgg(df: DataFrame, minutes: Int): DataFrame = {
    val bucketNs = minutes * 60L * NanosPerSecond
    // Floor division, not `div` (which truncates toward zero): pre-epoch
    // timestamps must land in their own window, matching the oracle's `//`.
    val bucket = (col("ts") - pmod(col("ts"), lit(bucketNs))) / lit(bucketNs)
    df.groupBy(
        timestamp_seconds(bucket.cast("long") * (minutes * 60L)).as("w_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Ordering is by
    * exact nanosecond timestamp with event_id tie-break. */
  def sessionize(df: DataFrame, gapMinutes: Int): DataFrame = {
    val gapNs = gapMinutes * 60L * NanosPerSecond
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    df.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats built on [[sessionize]]. */
  def sessionStats(df: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(df, gapMinutes)
      .groupBy(col("user_id"))
      .agg(
        max(col("session_idx")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))
}
