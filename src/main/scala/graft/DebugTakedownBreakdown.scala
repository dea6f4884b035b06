package graft

import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Dev-only: attribute pipeline_takedown_audit's wall time to its
  * lifecycle pieces (fp key-rows derivation, v1 write, linked takedown
  * publish, certification probe) — the r17 optimization round's
  * measurement for verdict item 3. */
object DebugTakedownBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[dbgtb] warmup failed: $e") }
    spark.catalog.clearCache()
    queries.Fixtures.reset()

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dbgtb] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (pass <- 1 to 2) {
      println(s"[dbgtb] --- pass $pass ---")
      // replicate the in-bench state: index_audit has already run, so the
      // fp-index frame memo is warm and the span store exists
      timed("index_audit (warm memo)") {
        SparkEntry.queries("pipeline_index_audit")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      // the store's pieces, replicated inline (same math as
      // takedownIndexStore, against a scratch root) to attribute time
      locally {
        import graft.core.DomainSpec
        val spec = DomainSpec(
          numShards = 8, indexer = classOf[graft.store.BloomKeyIndexer].getName,
          indexType = operators.Dedup.SpanIndexType,
          capSemantics = DomainSpec.CapTombstoneV1)
        val rootStr = s"target/graft-scratch/dbgtb-$pass/takedown-fp-index"
        val root = new org.apache.hadoop.fs.Path(rootStr)
        root.getFileSystem(queries.Fixtures.conf)
          .delete(root, true)
        val st = graft.store.DomainStore.create(rootStr, spec, queries.Fixtures.conf)
        val frame = timed("  fp-index frame (memo)") {
          queries.PipelineQueries.fpIndexFrame(spark, sfDir)
        }
        timed("  v1 write") { st.write(frame, version = 1L) }
        val rows = timed("  keyrows derive+ckpt") {
          queries.PipelineQueries.takedownKeyRows(spark, sfDir)
        }
        timed("  takedown publish (linked)") {
          operators.Dedup.fpIndexDeleteRows(st,
            rows.where(col("rid").cast("long") % queries.PipelineQueries.AuditDropMod === 0),
            newVersion = 2L, linked = true)
        }
      }
      val store = timed("takedown store (v1+v2)") {
        queries.PipelineQueries.takedownIndexStore(spark, sfDir)
      }
      timed("audit action") {
        SparkEntry.queries("pipeline_takedown_audit")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      queries.Fixtures.reset()
    }
    spark.stop()
  }
}
