package graft

import org.apache.spark.sql.functions._

import graft.core.{DomainSpec, Sessions}
import graft.store.DomainStore

/**
 * Dev-only: does the sampled idAudit actually cost ~1/m (the ADVICE
 * cadence claim)? The sample gate is applied INSIDE the engine on the
 * derived (key, rid) rows, so the claim rests on Catalyst pushing
 * `xxhash64(id) % m == 0` below the family kernel (for the band family:
 * through the band/signature projections and the per-id minhash
 * aggregation — legal because rid is a function of the grouping key).
 * This measures full vs sampled wall on a real corpus and prints the
 * pushed-filter line of the sampled plan so the answer is a number plus
 * the plan evidence, not an assumption.
 *
 * Usage: runMain graft.DebugAuditSample [sfDir=/root/testdata/sf0.1] [m=16]
 */
object DebugAuditSample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val m = args.lift(1).map(_.toLong).getOrElse(16L)
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = new org.apache.hadoop.conf.Configuration()

    val docs = queries.Fixtures.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val root = "/root/repo/target/audit-sample-band"
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val store = DomainStore.create(
      root, DomainSpec(8, persistenceFormat = DomainSpec.KvSorted), conf)
    val t0 = System.nanoTime()
    store.write(operators.Dedup.bandIndexKv(docs, "doc_id", "text"), 1L)
    println(f"[audit-sample] index build                ${(System.nanoTime() - t0) / 1e9}%7.2f s")

    def timeIt(what: String)(f: => Long): Double = {
      // best of two: the first pass pays scan warmup
      val (best, n) = (1 to 2).map { _ =>
        val s = System.nanoTime()
        val n = f
        ((System.nanoTime() - s) / 1e9, n)
      }.minBy(_._1)
      println(f"[audit-sample] $what%-26s $best%7.2f s ($n rows)")
      best
    }
    // construct each audit frame ONCE (construction itself runs the
    // eager tombstone-checkpoint job) — the timed thunks and the plan
    // dump below reuse the same frames
    val fullFrame = operators.Dedup.bandIndexIdAudit(store, docs, "doc_id", "text")
    val sampFrame =
      operators.Dedup.bandIndexIdAudit(store, docs, "doc_id", "text", sampleMod = m)
    val fullS = timeIt("full audit (m=1)")(fullFrame.count())
    val sampS = timeIt(s"sampled audit (m=$m)")(sampFrame.count())
    println(f"[audit-sample] sampled/full wall ratio: ${sampS / fullS}%.2f " +
      f"(1/m = ${1.0 / m}%.3f)")

    // plan evidence: is the id-hash predicate at the corpus scan?
    val plan = sampFrame.queryExecution.optimizedPlan.toString
    val pushed = plan.linesIterator
      .filter(l => l.contains("xxhash64") && (l.contains("Filter") || l.contains("Scan")))
      .take(4).toList
    println(s"[audit-sample] xxhash64 filter lines in optimized plan:")
    pushed.foreach(l => println(s"[audit-sample]   ${l.trim.take(460)}"))

    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
