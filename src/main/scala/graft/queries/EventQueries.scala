package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Driver-contract queries for event-stream operators (batch forms; the
  * streaming twins live in graft.streaming and are pinned equal to these
  * in ScalaTest). */
object EventQueries {

  val WindowMinutes = 5
  val SessionGapMinutes = 30

  /** Events with ts truncated to whole microseconds (still ns units).
    * DuckDB coerces the parquet TIMESTAMP(NANOS) column to a microsecond
    * TIMESTAMP, so sub-µs nanos exist only on the Spark side; an event
    * within 999 ns of a window/gap boundary would bucket differently in
    * the two engines. Truncating here makes both engines see identical
    * instants — the operators themselves stay ns-native. */
  /** Events with an added integer-microsecond `ts_us` column (the basis
    * the asof/interval contract queries share with their oracles). */
  private def usTsEvents(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))

  private def usEvents(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "events")
      .withColumn("ts", expr("(ts div 1000) * 1000"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_window_agg" -> { (s, dir) =>
      Events.windowAgg(usEvents(s, dir), WindowMinutes)
    },
    "ev_sessions" -> { (s, dir) =>
      Events.sessionStats(usEvents(s, dir), SessionGapMinutes)
    },
    // As-of attribution: each purchase picks up the latest prior click of
    // the same user (left semantics; clicks deduped per (user, ts) keeping
    // the max event_id so the payload is deterministic). The oracle is
    // DuckDB's native ASOF LEFT JOIN. This contract query runs on
    // MICROSECOND timestamps (`ts div 1000` — truncation == DuckDB's,
    // both positive): DuckDB coerces the parquet TIMESTAMP(NANOS) column
    // to a microsecond TIMESTAMP, so a ns-basis gap could never hash-match.
    // The operator itself is ns-native (OperatorsSpec pins ns semantics).
    "ev_asof_join" -> { (s, dir) =>
      val (purchases, clicks) = asofInputs(s, dir)
      Events.asOfJoin(purchases, clicks, Seq("user_id"), "ts_us", Seq("click_id"))
        .select(
          col("event_id"), col("user_id"), col("click_id"),
          (col("ts_us") - col("asof_ts")).as("gap_us"))
    },
    "ev_interval_join" -> intervalJoinQuery _,
    // The skew-proof bucketed formulation, same oracle: per-task work is
    // bounded by (user, day-bucket), not a hot user's whole history.
    "ev_asof_join_bucketed" -> { (s, dir) =>
      val (purchases, clicks) = asofInputs(s, dir)
      Events.asOfJoinBucketed(
        purchases, clicks, Seq("user_id"), "ts_us", Seq("click_id"),
        bucketNs = 24L * 3600 * 1000000) // 1 day in us
        .select(
          col("event_id"), col("user_id"), col("click_id"),
          (col("ts_us") - col("asof_ts")).as("gap_us"))
    },
    // Ordered conversion funnel view -> click -> purchase: stage i
    // counts only strictly after stage i-1's earliest reach. STRICT
    // comparisons make sub-µs precision visible (two events inside one
    // µs order differently at ns), so the contract query runs on the
    // µs-truncated basis like the asof/interval queries — the operator
    // itself stays ns-native.
    "ev_funnel" -> { (s, dir) =>
      Events.funnel(usEvents(s, dir), "user_id", "event_type", "ts", FunnelStages)
    },
    // Weekly cohort retention matrix: cohort = first-seen week bucket,
    // one row per (cohort, weeks-since) with the distinct-user count.
    "ev_retention" -> { (s, dir) =>
      Events.retention(
        Fixtures.table(s, dir, "events"), "user_id", "ts", RetentionBucketNs)
    },
    // Event-path transitions (what-do-users-do-next): per-user ordered
    // (ts, event_id tiebreak) consecutive pairs, counted per
    // (from_type, to_type) edge. µs-truncated events (usEvents) so the
    // ORDER — including which rows tie — is identical engine to engine
    // even if the fixture's timestamp precision changes.
    "ev_transitions" -> { (s, dir) =>
      Events.transitions(usEvents(s, dir), "user_id", "event_type", "ts", "event_id")
    },
    // Skew-proof twins of ev_sessions / ev_transitions: per-task work is
    // bounded by one (user, 6-hour bucket), never a hot user's whole
    // history (the asOfJoinBucketed pattern). Same oracle as the plain
    // formulation — the driver hash-compare doubles as an equivalence
    // proof on the real fixture.
    "ev_sessions_bucketed" -> { (s, dir) =>
      Events.sessionStatsBucketed(usEvents(s, dir), SessionGapMinutes, SessionBucketNs)
    },
    "ev_transitions_bucketed" -> { (s, dir) =>
      Events.transitionsBucketed(
        usEvents(s, dir), "user_id", "event_type", "ts", "event_id", SessionBucketNs)
    })

  val SessionBucketNs: Long = 6L * 3600 * 1000000000L // 6 hours

  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")
  val RetentionBucketNs: Long = 7L * 24 * 3600 * 1000000000L // 1 week

  val ErrorWindowUs: Long = 30L * 60 * 1000000 // 30 min in us

  /** Interval join: clicks landing inside the 30-minute window opened by
    * each error event of the same user (bucketized equi-join — see
    * Events.intervalJoin; the oracle is the plain non-equi SQL join). */
  def intervalJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = usTsEvents(s, dir)
    val errors = ev.where(col("event_type") === "error")
      .select(
        col("event_id").as("error_id"), col("user_id"),
        col("ts_us").as("w_start"), (col("ts_us") + ErrorWindowUs).as("w_end"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
    Events.intervalJoin(
      clicks, errors, Seq("user_id"), "ts_us", "w_start", "w_end",
      bucketNs = ErrorWindowUs)
      .select(col("error_id"), col("click_id"), (col("ts_us") - col("w_start")).as("offset_us"))
  }

  /** (purchases, clicks-deduped-per-(user, ts)) on the shared us basis. */
  private def asofInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val ev = usTsEvents(s, dir)
    val wTs = Window.partitionBy(col("user_id"), col("ts_us"))
      .orderBy(col("click_id").desc)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
      .withColumn("rn", row_number().over(wTs))
      .where(col("rn") === 1).drop("rn")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    (purchases, clicks)
  }

  private val WindowNs = WindowMinutes * 60L * 1000000000L
  private val GapNs = SessionGapMinutes * 60L * 1000000000L

  def oracleSql: Map[String, String] = Map(
    // Integer-nanosecond window math, mirroring Events.windowAgg exactly.
    "ev_window_agg" ->
      s"""SELECT make_timestamp((epoch_ns(ts) // $WindowNs) * ${WindowMinutes * 60} * 1000000) AS w_start,
         |  event_type,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    "ev_sessions" -> SessionsOracle,
    "ev_sessions_bucketed" -> SessionsOracle,
    // DuckDB's native ASOF LEFT JOIN is the oracle for the union+window
    // implementation; clicks deduped per (user, ts) on both sides so the
    // matched payload is deterministic. Microsecond basis — see the query.
    "ev_asof_join_bucketed" -> AsofOracle,
    "ev_asof_join" -> AsofOracle,
    // Stage frontiers as nested CTEs: each stage's earliest qualifying
    // event strictly after the previous frontier. Only ORDER comparisons
    // on ts, so DuckDB's µs timestamps and Spark's ns longs agree.
    "ev_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s0 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT u.user_id,
        |  CAST(CASE WHEN s2.user_id IS NOT NULL THEN 3
        |            WHEN s1.user_id IS NOT NULL THEN 2
        |            WHEN s0.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS INT) AS stage
        |FROM u LEFT JOIN s0 USING (user_id)
        |  LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)""".stripMargin,
    // Week buckets by integer ns floor-division (both engines positive
    // here, so // == floor on each).
    "ev_retention" ->
      s"""WITH b AS (SELECT DISTINCT user_id,
         |    epoch_ns(ts) // $RetentionBucketNs AS bucket
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |c AS (SELECT user_id, min(bucket) AS cohort FROM b GROUP BY 1)
         |SELECT CAST(c.cohort AS BIGINT) AS cohort,
         |  CAST(b.bucket - c.cohort AS BIGINT) AS period,
         |  CAST(count(*) AS BIGINT) AS n_users
         |FROM b JOIN c USING (user_id)
         |GROUP BY 1, 2""".stripMargin,
    // Per-user lag over (ts, event_id) — the same deterministic order
    // the Spark window uses (ns = µs·1000 exactly, so ordering and ties
    // agree engine to engine; event_id breaks the ties).
    "ev_transitions" -> TransitionsOracle,
    "ev_transitions_bucketed" -> TransitionsOracle,
    // the bucketized equi-join must equal the plain non-equi join
    "ev_interval_join" ->
      s"""WITH e AS (SELECT event_id AS error_id, user_id, epoch_us(ts) AS w_start,
         |    epoch_us(ts) + $ErrorWindowUs AS w_end
         |  FROM events WHERE event_type = 'error'),
         |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS tus
         |  FROM events WHERE event_type = 'click')
         |SELECT e.error_id, c.click_id, c.tus - e.w_start AS offset_us
         |FROM c JOIN e ON c.user_id = e.user_id
         |  AND c.tus >= e.w_start AND c.tus < e.w_end""".stripMargin)

  // Shared by the plain and bucketed session/transition formulations —
  // identical semantics, different physical plan (the bucketed Spark
  // side hashing equal to this window SQL IS the equivalence proof).
  private val SessionsOracle =
    s"""WITH o AS (SELECT user_id, value, epoch_ns(ts) AS tns, event_id FROM events),
       |l AS (SELECT user_id, value, tns,
       |    lag(tns) OVER (PARTITION BY user_id
       |      ORDER BY tns NULLS FIRST, event_id NULLS FIRST) AS prev_tns
       |  FROM o),
       |s AS (SELECT user_id, value,
       |    CASE WHEN prev_tns IS NULL OR tns - prev_tns > $GapNs THEN 1 ELSE 0 END AS ns
       |  FROM l)
       |SELECT user_id,
       |  CAST(sum(ns) AS BIGINT) AS n_sessions,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
       |FROM s GROUP BY user_id""".stripMargin

  private val TransitionsOracle =
    """WITH e AS (SELECT user_id, event_type, ts, event_id FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
      |t AS (SELECT event_type AS to_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM e)
      |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
      |FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2""".stripMargin

  // Shared by the plain and bucketed formulations — identical semantics,
  // different physical plan.
  private val AsofOracle =
      """WITH c0 AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, tus, event_id AS click_id FROM c0 WHERE rn = 1),
        |p AS (SELECT event_id, user_id, epoch_us(ts) AS tus
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, c.click_id, p.tus - c.tus AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.tus >= c.tus""".stripMargin
}
