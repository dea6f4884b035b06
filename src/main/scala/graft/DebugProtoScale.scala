package graft

import org.apache.spark.sql.functions._

import graft.core.Sessions

/**
 * Dev-only: the distributed prototypePruning tier at its DESIGN POINT
 * (VERDICT r13 task 6). Above `ProtoWindowMaxRows` clustered rows the
 * operator ranks via the two-phase global prefix sum
 * ([[graft.operators.Ranking.globalRank]]) instead of
 * `Window.partitionBy(cell)` — the window formulation sorts ~N/2^planes
 * rows inside EACH of 2^planes tasks (64 stragglers, ~94% idle
 * executors at 1000 nodes). The tier switch is output-identity-pinned
 * at fixture scale (OperatorsSpec, via the injectable `windowMaxRows`);
 * THIS measures the tier at the scale the pin cannot reach: ≥2M
 * clustered rows, 64 cells, with a hot-cell skew (half the corpus in
 * ONE cell — the boilerplate-embedding shape). Reported per tier: wall
 * and the heaviest stages as (tasks, max, mean) — the straggler reads
 * as skew (max/mean) ≫ 1 on the window tier's 64-task sort, and must
 * stay ≈1 on every stage of the distributed tier.
 *
 * Usage: runMain graft.DebugProtoScale [rows=2097152] [dim=16]
 */
object DebugProtoScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2L << 20)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hot-cell skew: even ids share ONE vector (one hot hyperplane cell
    // holding half the corpus); odd ids scatter deterministically
    val emb = spark.range(rows).select(
      col("id").as("vec_id"),
      when(col("id") % 2 === 0,
        array((1 to dim).map(j => lit(0.25 + j * 0.01)): _*))
        .otherwise(array((1 to dim).map(j => sin(col("id") * j)): _*))
        .as("embedding"))
      .localCheckpoint(true) // fixture off the clock

    val stats = new StageStats("proto-")
    spark.sparkContext.addSparkListener(stats)
    // remove in finally (the DebugTakedownScale pattern). Cross-tier
    // bleed-through is already impossible by construction: stage ids are
    // unique per SparkContext, so a tier-1 task-end trailing past reset()
    // fails the stages.contains check (tier 2 only registers ITS OWN new
    // stage ids) — the reset order below is belt-and-braces, not the guard.
    try {
      for ((label, bound) <- Seq(
          ("distributed (globalRank)", graft.operators.Similarity.ProtoWindowMaxRows.toLong),
          ("window (contrast)", Long.MaxValue))) {
        stats.reset()
        spark.sparkContext.setJobGroup(s"proto-$label", label)
        val t0 = System.nanoTime()
        val out = graft.operators.Similarity.prototypePruning(
          emb, "vec_id", "embedding", planes = 6, windowMaxRows = bound)
        val dropped = out.where(!col("kept")).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        println(f"[proto-scale] $label%-26s $rows%9d rows x $dim dims: " +
          f"wall $wall%6.2f s (dropped $dropped)")
        stats.report("proto-scale")
      }
    } finally spark.sparkContext.removeSparkListener(stats)
    spark.stop()
  }
}
