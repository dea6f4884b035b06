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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_window_agg" -> { (s, dir) =>
      Events.windowAgg(Fixtures.table(s, dir, "events"), WindowMinutes)
    },
    "ev_sessions" -> { (s, dir) =>
      Events.sessionStats(Fixtures.table(s, dir, "events"), SessionGapMinutes)
    })

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
    "ev_sessions" ->
      s"""WITH o AS (SELECT user_id, value, epoch_ns(ts) AS tns, event_id FROM events),
         |l AS (SELECT user_id, value, tns,
         |    lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS prev_tns
         |  FROM o),
         |s AS (SELECT user_id, value,
         |    CASE WHEN prev_tns IS NULL OR tns - prev_tns > $GapNs THEN 1 ELSE 0 END AS ns
         |  FROM l)
         |SELECT user_id,
         |  CAST(sum(ns) AS BIGINT) AS n_sessions,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         |FROM s GROUP BY user_id""".stripMargin)
}
