package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's two flagship entry points end to end — bulk domain
    * build (SURVEY.md §3.2) + multiGet point lookups (§3.1) on lineitem. */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val domain = Fixtures.lineitemDomain(spark, sfDir)
    val keys = Fixtures.table(spark, sfDir, "lineitem")
      .where(col("l_orderkey") % 97 === 0)
      .select(composite_key(long_be(col("l_orderkey")), int_be(col("l_linenumber"))).as("key"))
    domain.multiGet(keys)
      .select(bytes_utf8(col("value")).as("l_suppkey"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data-pipeline extensions). Lazy val: assembled once, not on
    * every per-query lookup. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    KvQueries.queries ++ RelQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimQueries.queries ++ MmQueries.queries ++
      EventQueries.queries ++ PipelineQueries.queries ++ SearchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    KvQueries.oracleSql ++ RelQueries.oracleSql ++ TextQueries.oracleSql ++
      DedupQueries.oracleSql ++ SimQueries.oracleSql ++ MmQueries.oracleSql ++
      EventQueries.oracleSql ++ PipelineQueries.oracleSql ++ SearchQueries.oracleSql
}
