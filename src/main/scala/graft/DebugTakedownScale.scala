package graft

import org.apache.spark.sql.functions._

import graft.core.{DomainSpec, Sessions}
import graft.store.DomainStore

/**
 * Dev-only: the MASS-TAKEDOWN audit (VERDICT r13 task 1). The takedown's
 * real design point is "remove these N documents today" where the
 * removed content shares one boilerplate band/fingerprint — the shape
 * that made the retired array formulation pack every removed id into ONE
 * `collect_list` cell (multi-GB at 100M ids) and scan
 * O(|cell| × |rids|) containments in one task. The row formulation
 * ([[graft.operators.IndexDelete.publishRemoval]]) keys the drop join on
 * (bucket, id), so a hot bucket's million removal rows hash across the
 * cluster by id and no task sees more than its share.
 *
 * Fixture: a band index of `indexed` docs sharing ONE text (all 32
 * band buckets hold every doc — live cells under the 4096 cap), then a
 * takedown of those docs PLUS `extra` never-indexed docs with the SAME
 * text — ≥1M removal ids landing on each of the 32 hot bucket keys.
 * Reported per size: wall, then the heaviest stages of the takedown's
 * own job group ([[StageStats]]) as (tasks, max, mean) —
 * a straggler reads as max >> mean WITHIN a stage (a one-task collect
 * of the hot bucket); balanced-but-heavy stages (the content-addressed
 * re-hash of the removed docs, inherent to content addressing) read as
 * max ≈ mean.
 *
 * Usage: runMain graft.DebugTakedownScale [extraIds=1048576]
 */
object DebugTakedownScale {
  def main(args: Array[String]): Unit = {
    val extraMax = args.headOption.map(_.toLong).getOrElse(1L << 20)
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = new org.apache.hadoop.conf.Configuration()

    val sharedText = (1 to 40).map(i => s"boilerplate${i % 7} clause$i shared").mkString(" ")
    val indexedN = 2048L // under the 4096 cap: cells stay LIVE (rewritten, not tombstoned)

    def docsFrame(ids: org.apache.spark.sql.DataFrame) =
      ids.select(col("id").as("doc_id"), lit(sharedText).as("text"))

    for (extra <- Seq(extraMax / 8, extraMax)) {
      val root = s"/root/repo/target/takedown-scale-$extra"
      new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val store = DomainStore.create(
        root, DomainSpec(16, persistenceFormat = DomainSpec.KvSorted), conf)
      store.write(
        operators.Dedup.bandIndexKv(
          docsFrame(spark.range(indexedN).toDF("id")), "doc_id", "text"),
        1L)
      val removed = docsFrame(
        spark.range(indexedN + extra).toDF("id")).localCheckpoint(true)

      val group = s"takedown-$extra"
      val listener = new StageStats(group)
      spark.sparkContext.addSparkListener(listener)
      val wall = try {
        spark.sparkContext.setJobGroup(group, s"takedown $extra")
        val t0 = System.nanoTime()
        operators.Dedup.bandIndexDelete(store, removed, "doc_id", "text", 2L)
        (System.nanoTime() - t0) / 1e9
      } finally {
        spark.sparkContext.clearJobGroup()
        Thread.sleep(500) // let the last task-end events drain
        spark.sparkContext.removeSparkListener(listener)
      }
      println(f"[takedown-scale] ${indexedN + extra}%9d removal ids on 32 hot buckets: " +
        f"wall $wall%6.2f s")
      listener.report("takedown-scale")
      assert(store.count(spark) > 0, "marker rows must survive the takedown")
    }
    spark.stop()
  }
}
