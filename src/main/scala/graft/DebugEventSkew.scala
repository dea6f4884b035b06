package graft

import org.apache.spark.scheduler._

import graft.core.Sessions

/**
 * Dev-only: the skewed-user event audit (BASELINE.md "sf1 event
 * analytics"). Wall-clock at local[32]/1M rows is fixed-overhead
 * dominated, so the straggler a hot user causes is measured where it
 * lives: the MAX SINGLE TASK duration (and input rows) of each query's
 * stages. The plain per-user-window formulations put the hot user's
 * whole history in one task (max task grows with the hot user); the
 * bucketed twins bound per-task work by (user, bucket) (max task grows
 * with the BUCKET, not the user). Two passes per query, min wall / min
 * max-task reported.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.DebugEventSkew
 */
object DebugEventSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cases: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "ev_sessions" -> (() => queries.EventQueries.queries("ev_sessions")(spark, sfDir)),
      "ev_sessions_bucketed" -> (() => queries.EventQueries.queries("ev_sessions_bucketed")(spark, sfDir)),
      "ev_transitions" -> (() => queries.EventQueries.queries("ev_transitions")(spark, sfDir)),
      "ev_transitions_bucketed" -> (() => queries.EventQueries.queries("ev_transitions_bucketed")(spark, sfDir)),
      "ev_funnel" -> (() => queries.EventQueries.queries("ev_funnel")(spark, sfDir)),
      "ev_retention" -> (() => queries.EventQueries.queries("ev_retention")(spark, sfDir)))

    for ((name, mk) <- cases) {
      val results = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        queries.Fixtures.reset()
        val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
        val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
        val group = s"skew-$name-${System.nanoTime()}"
        val listener = new SparkListener {
          override def onJobStart(j: SparkListenerJobStart): Unit =
            if (group == j.properties.getProperty("spark.jobGroup.id"))
              j.stageInfos.foreach(si => stages.add(si.stageId))
          override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
            if (stages.contains(t.stageId) && t.taskInfo != null) {
              val d = t.taskInfo.duration
              var cur = maxTaskMs.get()
              while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
            }
        }
        spark.sparkContext.addSparkListener(listener)
        try {
          spark.sparkContext.setJobGroup(group, name)
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.clearJobGroup()
          val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
          while (System.nanoTime() < deadline && maxTaskMs.get() == 0L) Thread.sleep(50)
          Thread.sleep(500) // drain listener queue
          (wall, maxTaskMs.get())
        } finally spark.sparkContext.removeSparkListener(listener)
      }
      val wall = results.map(_._1).min
      val maxTask = results.map(_._2).min
      println(f"[skew] $name%-26s wall=${wall}%6.2f s  max_task=${maxTask}%6d ms")
    }
    spark.stop()
  }
}
