package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.Events

/**
 * Structured-Streaming twins of the batch event operators. The same
 * declarative aggregation runs over `readStream` — Spark plans the
 * incremental execution, so batch and streaming results are identical by
 * construction (pinned in StreamingSpec).
 *
 * The reference has no streaming; its nearest semantics is the updater
 * poll loop + hot-swap (bounded-staleness snapshots, SURVEY.md §2.5). A
 * micro-batch file stream over a domain's version directory is the direct
 * upgrade of that pattern.
 */
object StreamingEvents {

  /** events table schema under the engine's ts-as-nanos convention. */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open a file-based event stream over a directory of parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(EventsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
  }

  /**
   * Streaming tumbling-window aggregation into an in-memory sink (complete
   * mode: windows re-emit as late files arrive — the file-stream analog of
   * the reference's "newest version wins" refresh). Returns the running
   * query; read results from `spark.table(queryName)`.
   */
  def windowAggToMemory(
      spark: SparkSession,
      dir: String,
      minutes: Int,
      queryName: String): StreamingQuery =
    Events.windowAgg(readEvents(spark, dir), minutes)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
}
