package graft

import org.apache.spark.sql.functions._

import graft.core.{DomainSpec, Sessions}
import graft.store.DomainStore

/**
 * Dev-only: the takedown cost model at 10x scale (BASELINE.md r10).
 * Builds a kv domain from the SynthScale 10x orders table (1.5M keys),
 * then times: (a) a FULL rebuild, (b) a delete of ~1% of keys, (c) a
 * delete of ONE key — delete must price like upsert (O(delta): only
 * shards a named key routes to rewrite, the rest copy-forward), never
 * like a rebuild. Two passes each, min reported.
 *
 * Usage: runMain graft.DebugDeleteScale [sfDir=/root/repo/target/sf1]
 */
object DebugDeleteScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = new org.apache.hadoop.conf.Configuration()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(
        graft.functions.long_be(col("o_orderkey")).as("key"),
        graft.functions.utf8_bytes(col("o_orderpriority")).as("value"))
    def timeIt(what: String)(f: => Unit): Unit = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[delete-scale] $what%-28s ${best}%6.2f s")
    }
    val root = "/root/repo/target/delete-scale-domain"
    new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val store = DomainStore.create(
      root, DomainSpec(64, persistenceFormat = DomainSpec.KvSorted), conf)
    var v = 0L
    timeIt("full build (1.5M keys)") { v += 1; store.write(orders, v) }
    val onePct = spark.read.parquet(s"$sfDir/orders.parquet")
      .where(col("o_orderkey") % 100 === 0)
      .select(graft.functions.long_be(col("o_orderkey")).as("key"))
    timeIt("delete 1% (15k keys)") { v += 1; store.delete(spark, onePct, v) }
    val oneKey = spark.read.parquet(s"$sfDir/orders.parquet").limit(1)
      .select(graft.functions.long_be(col("o_orderkey")).as("key"))
    timeIt("delete 1 key") { v += 1; store.delete(spark, oneKey, v) }
    println(s"[delete-scale] final count = ${store.count(spark)}")
    spark.stop()
  }
}
