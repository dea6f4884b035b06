package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery}
import org.apache.spark.sql.types._

import graft.operators.Events

/** One raw event under the ts-as-nanos convention. */
case class StreamEvent(
    event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double, props: String)

/** Per-user session accumulator carried across micro-batches. */
case class SessionState(n_sessions: Long, last_ts: Long, n_events: Long, value_cents: Long)

/** Latest reference event seen for a user (the as-of state). */
case class RefState(ts: Long, ref_id: Long)

/** One emitted as-of enrichment (ref fields None when no prior ref). */
case class AsofMatch(event_id: Long, user_id: Long, ref_id: Option[Long], gap_ns: Option[Long])

/** Running per-user session stats (the streaming output row). */
case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long, value_cents: Long)

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

  /** events table schema with the DEFAULT on-disk `ts` encoding
    * (µs-typed → TIMESTAMP_NTZ in Spark terms). The driver regenerates
    * testdata between rounds and the ts type has FLIPPED before
    * (NANOS→MICROS, the CLAUDE.md trap), so [[readEvents]] does not
    * trust this default: it probes the actual file footers at stream
    * open and adopts whatever ts type they carry. */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", org.apache.spark.sql.types.TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open a file-based event stream over a directory of parquet files;
    * `ts` is delivered as BIGINT nanos regardless of the file encoding.
    * The stream schema's ts field is probed from the files already in
    * `dir` (one batch footer sniff — a file stream needs a declared
    * schema, and declaring the wrong ts class fails every batch), so
    * both nanos-as-long and µs-timestamp parquet work unmodified; an
    * empty dir falls back to [[EventsSchema]]. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema =
      try {
        val probedTs = spark.read.parquet(dir).schema("ts").dataType
        StructType(EventsSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = probedTs) else f))
      } catch { case _: Exception => EventsSchema }
    graft.operators.Events.tsAsNanos(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir))
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

  /** documents table schema (the dedup-on-ingest stream source). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /**
   * Dedup-on-ingest: the *same* declarative [[graft.operators.Dedup.exact]]
   * operator run over a document file stream — Spark keeps the
   * (normalized-text -> min id, count) groups as streaming state, so as
   * files arrive the table always holds the exact-dedup result of
   * everything seen so far. After the stream drains it equals the batch
   * result (pinned in StreamingSpec).
   */
  def exactDedupToMemory(
      spark: SparkSession,
      dir: String,
      queryName: String): StreamingQuery = {
    val docs = spark.readStream
      .schema(DocumentsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    graft.operators.Dedup.exact(docs, "doc_id", "text")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /**
   * The production-scale streaming window twin: append mode + watermark.
   * Complete mode re-emits every window each batch (fine for tests,
   * unbounded state/output on an unbounded stream); this variant declares
   * lateness via the watermark so Spark finalizes and EMITS each window
   * exactly once and drops its state — the pattern that runs forever.
   * Windows are epoch-aligned (`window()` semantics), matching
   * [[graft.operators.Events.windowAgg]] for non-negative timestamps;
   * output rows are (w_start, event_type, n_events, value_cents).
   * Only windows the watermark has closed are in the sink; the final
   * still-open window(s) emit on the next data arrival.
   */
  def windowAggAppendToFiles(
      spark: SparkSession,
      dir: String,
      minutes: Int,
      lateness: String,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    import org.apache.spark.sql.functions._
    readEvents(spark, dir)
      // Exact integer floor-division to seconds: a double division of
      // ns-since-epoch loses ~190ns of precision, enough to misassign a
      // window-boundary event. Sub-second truncation can't change
      // minute-granularity window membership.
      .withColumn(
        "ts_ts",
        timestamp_seconds(
          ((col("ts") - pmod(col("ts"), lit(1000000000L))) / lit(1000000000L)).cast("long")))
      .withWatermark("ts_ts", lateness)
      .groupBy(
        window(col("ts_ts"), s"$minutes minutes").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum((round(col("value") * 100)).cast("long")).as("value_cents"))
      .select(
        col("w.start").as("w_start"), col("event_type"),
        col("n_events"), col("value_cents"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** HALF_UP cents — matches Spark's round() on doubles exactly. */
  private def cents(v: Double): Long =
    new java.math.BigDecimal(v * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /**
   * Stateful streaming sessionization: per-user session state carried
   * across micro-batches via mapGroupsWithState (the KeyValueGroupedDataset
   * custom-state path). Events are ordered by (ts, event_id) within each
   * batch; cross-batch ordering relies on the file stream delivering files
   * in event-time order (true for time-partitioned ingest dirs — for fully
   * unordered sources, buffer by watermark before this operator).
   * Emits the running per-user totals each batch (update mode). The
   * memory sink APPENDS each batch's updates, so a user touched by
   * several batches has several rows — read the final state through
   * [[latestSessionStats]], which keeps the newest row per user (rows are
   * monotone in n_events); that result equals the batch
   * [[graft.operators.Events.sessionStats]] once the stream drains.
   */
  def sessionStatsToMemory(
      spark: SparkSession,
      dir: String,
      gapMinutes: Int,
      queryName: String): StreamingQuery = {
    import spark.implicits._
    val gapNs = gapMinutes * 60L * 1000000000L
    readEvents(spark, dir).as[StreamEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[StreamEvent], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
          events.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val newSession = st.last_ts == Long.MinValue || e.ts - st.last_ts > gapNs
            st = SessionState(
              st.n_sessions + (if (newSession) 1L else 0L),
              e.ts,
              st.n_events + 1L,
              st.value_cents + cents(e.value))
          }
          state.update(st)
          UserSessions(uid, st.n_sessions, st.n_events, st.value_cents)
      }
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /**
   * Streaming twin of [[graft.operators.Events.asOfJoin]]: enrich each
   * `probeType` event with the latest prior `refType` event of the same
   * user, across micro-batches. State per user is ONE row (the newest
   * reference) — constant-size state per key, the layout that runs
   * forever; each probe emits exactly once (append mode). Within a batch
   * events are ordered by (ts, ref-before-probe, event_id), giving the
   * batch operator's `<=` semantics at equal ts and its max-event_id
   * tie-break among same-ts references. Cross-batch ordering relies on
   * the file stream delivering files in event-time order, exactly like
   * [[sessionStatsToMemory]] — for fully unordered sources, buffer by
   * watermark upstream.
   */
  def asOfEnrichToMemory(
      spark: SparkSession,
      dir: String,
      probeType: String,
      refType: String,
      queryName: String): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    readEvents(spark, dir).as[StreamEvent]
      .filter(e => e.event_type == probeType || e.event_type == refType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[StreamEvent], state: GroupState[RefState]) =>
          var st = state.getOption
          val out = Seq.newBuilder[AsofMatch]
          events.toSeq
            .sortBy(e => (e.ts, if (e.event_type == refType) 0 else 1, e.event_id))
            .foreach { e =>
              if (e.event_type == refType) {
                if (st.forall(s =>
                    e.ts > s.ts || (e.ts == s.ts && e.event_id > s.ref_id)))
                  st = Some(RefState(e.ts, e.event_id))
              } else {
                // guard against out-of-event-time file delivery: a stored
                // reference NEWER than the probe must not match (the batch
                // operator would return an older ref or null, never a
                // negative gap)
                val eligible = st.filter(_.ts <= e.ts)
                out += AsofMatch(
                  e.event_id, uid, eligible.map(_.ref_id), eligible.map(s => e.ts - s.ts))
              }
            }
          st.foreach(state.update)
          out.result().iterator
      }
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /** Final per-user state from an update-mode memory table: the sink
    * appends every batch's emissions, so keep only each user's newest row.
    * n_events strictly increases across a user's emitted rows, so
    * max-by-n_events IS the latest. */
  def latestSessionStats(spark: SparkSession, queryName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)
    spark.table(queryName)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }
}
