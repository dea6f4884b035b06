package graft.core

import org.apache.spark.sql.SparkSession

/** The one place the engine's session tuning lives — every entry point
  * (Bench, Verify, Smoke, Debug, Plans, tests) builds through here so a
  * config change can't silently miss a runner. */
object Sessions {

  /** Builder with the engine's required session config applied. */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // plain `key = X` filters over domain scans imply their shard —
      // inject the routing conjunct so partition pruning fires (see
      // graft.plans.ShardPruningRule)
      .withExtensions(_.injectOptimizerRule(_ => graft.plans.ShardPruningRule))
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // sketch aggregates are 128+ columns wide; keep them in codegen
      // (spark.sql.codegen.maxFields defaults to 100)
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) -> read as BIGINT nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
