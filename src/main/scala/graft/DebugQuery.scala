package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.core.Sessions

/** Dev-only: run contract queries by name and report what ACTUALLY
  * executed — the final adaptive plan (AQE hides exchange reuse from the
  * initial plan: 8 planned copies of a subtree can be 1 executed stage)
  * plus job-group-scoped stage stats (tasks / max / skew / shuffle
  * records+bytes per stage). The measurement tool for the optimization
  * rounds: per-query evidence of (a) how many shuffles really ran, (b)
  * how many records/bytes they moved, (c) where the wall time went.
  *
  * Usage: runMain graft.DebugQuery <query...>  (SPARK_GRAFT_SF_DIR, _CPUS)
  */
object DebugQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_minhash")

    val stats = new StageStats("dbgq")
    spark.sparkContext.addSparkListener(stats)
    // The noop write runs its OWN QueryExecution (the returned frame's
    // queryExecution is never executed), so the final adaptive plan is
    // only reachable through a listener on the write.
    val lastPlan = new AtomicReference[String]("")
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        lastPlan.set(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })

    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[dbgq] warmup failed: $e") }
    spark.catalog.clearCache()
    queries.Fixtures.reset()

    val qmap = SparkEntry.queries
    for (pass <- 1 to 2; name <- names) {
      spark.sparkContext.setJobGroup(s"dbgq-$name", name)
      stats.reset()
      val t0 = System.nanoTime()
      qmap(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      Thread.sleep(500)
      val plan = lastPlan.get()
      val fin = plan.split("== Initial Plan ==")(0)
      def n(pat: String, s: String): Int = pat.r.findAllIn(s).length
      println(f"[dbgq] pass$pass $name%-28s ${sec}%6.2f s  " +
        f"finalPlan: Exchange=${n("""(?m)^\s*[+:][- ]*Exchange""", fin)} " +
        f"Reused=${n("ReusedExchange|ReusedQueryStage|TableCacheQueryStage", fin)} " +
        f"shuffle: ${stats.shuffleRecords.get()}%,d rec ${stats.shuffleBytes.get() / (1024 * 1024)}%,d MB")
      stats.report(s"dbgq $name", top = 8)
      if (pass == 2 && sys.env.contains("DBGQ_PRINT_PLAN")) println(fin)
      spark.catalog.clearCache()
      queries.Fixtures.reset()
    }
    spark.stop()
  }
}
