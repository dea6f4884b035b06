package graft

import org.apache.spark.scheduler._

/**
 * Job-group-scoped stage statistics for the dev-only scale audits
 * (DebugTakedownScale / DebugProtoScale / DebugCapScale — one
 * definition, not a drifting copy per main): tracks per-stage
 * (tasks, max task ms, sum task ms) plus total shuffle write records
 * for every job whose group id starts with `groupPrefix` — the
 * CLAUDE.md job-group scoping rule, robust when other jobs share the
 * SparkContext. `report` prints the heaviest stages as
 * (tasks, max, mean, skew): a straggler reads as skew (max/mean) ≫ 1
 * WITHIN a stage; balanced-but-heavy stages read ≈ 1.
 */
private[graft] final class StageStats(groupPrefix: String) extends SparkListener {
  private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  // stage id -> name (callsite), for attribution in reports
  private val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
  // per stage: (tasks, max task ms, sum task ms, shuffle write records,
  // shuffle write bytes)
  private val stats =
    new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long, Long, Long)]()
  val shuffleRecords = new java.util.concurrent.atomic.AtomicLong(0L)
  val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)

  override def onJobStart(j: SparkListenerJobStart): Unit =
    // properties is documented nullable on SparkListenerJobStart — an NPE
    // here is swallowed by the listener bus and silently drops the job's
    // stages from the audit (a shuffle-record claim under-reports and
    // reads as a false pass)
    if (Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        .exists(_.startsWith(groupPrefix)))
      j.stageInfos.foreach { si =>
        stages.add(si.stageId)
        names.put(si.stageId, si.name.takeWhile(_ != '\n').take(60))
      }

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
    // successful attempts only: stage retries and speculative duplicates
    // would double-count durations and shuffle write records, over-reporting
    // skew under local retry noise
    if (t.reason == org.apache.spark.Success &&
        stages.contains(t.stageId) && t.taskInfo != null) {
      val (recs, bytes) =
        if (t.taskMetrics != null && t.taskMetrics.shuffleWriteMetrics != null)
          (t.taskMetrics.shuffleWriteMetrics.recordsWritten,
            t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        else (0L, 0L)
      stats.merge(t.stageId,
        (1, t.taskInfo.duration, t.taskInfo.duration, recs, bytes),
        (a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3,
          a._4 + b._4, a._5 + b._5))
      shuffleRecords.addAndGet(recs)
      shuffleBytes.addAndGet(bytes)
    }

  def reset(): Unit = {
    stages.clear(); names.clear(); stats.clear()
    shuffleRecords.set(0L); shuffleBytes.set(0L)
  }

  /** Print the `top` heaviest stages under `tag` (after a short drain
    * sleep — task-end events trail the action's return). */
  def report(tag: String, top: Int = 4): Unit = {
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    stats.asScala.toSeq.sortBy(-_._2._2).take(top).foreach {
      case (sid, (nt, mx, sm, recs, bytes)) =>
        println(f"[$tag]   stage $sid%4d tasks $nt%4d max $mx%6d ms " +
          f"mean ${sm / math.max(nt, 1)}%6d ms  skew ${mx.toDouble * nt / math.max(sm, 1)}%4.1fx" +
          f"  wrote $recs%8d rec ${bytes / (1024 * 1024)}%5d MB  " +
          names.getOrDefault(sid, ""))
    }
  }
}
