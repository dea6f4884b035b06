package graft.queries

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.functions._
import graft.store.DomainStore

/**
 * Scratch domain builders for the driver-contract queries. Domains are
 * materialized once per (scale-factor dir, fixture) per JVM under the
 * build's scratch dir, then reused by subsequent queries in the same run.
 */
object Fixtures {

  val ScratchRoot = "/root/repo/target/graft-scratch"

  // ConcurrentHashMap.computeIfAbsent runs the builder at most once per
  // key — TrieMap.getOrElseUpdate may run it concurrently in two threads,
  // and the builder's delete-then-write would corrupt the other's output.
  private val built = new java.util.concurrent.ConcurrentHashMap[String, DomainStore]()

  // Non-domain per-run memos (e.g. the exact-trained quantizer two
  // contract queries share) — same once-per-JVM-per-pass lifecycle as the
  // domain fixtures, forgotten together by reset().
  private val memos = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Compute-once cache for expensive derived state shared by several
    * contract queries in one bench/verify pass (the [[domain]] pattern
    * for non-domain values). The key must encode every input the value
    * depends on. */
  def memo[T <: AnyRef](key: String)(build: => T): T =
    memos.computeIfAbsent(key, _ => build).asInstanceOf[T]

  /** Forget all built fixtures AND memos so the next query rebuilds them
    * — used by Bench between passes so domain-build queries (and shared
    * trained state) time the real work in every pass (not just the
    * first). */
  def reset(): Unit = { built.clear(); memos.clear() }

  def conf = new Configuration()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet has carried TIMESTAMP(NANOS) (read as BIGINT nanos
    // under this legacy flag) or TIMESTAMP(MICROS) depending on testdata
    // generation; either way the engine convention is ts = BIGINT nanos
    // (graft.operators.Events), so normalize here — the one fixture
    // boundary every contract query reads through.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The test-scale tables are single-row-group files — unsplittable, so
    // without this every pipeline runs its scan-side work on one core.
    // One tiny shuffle buys full parallelism; predicates and pruning still
    // push through Repartition to the scan. (At production scale inputs
    // span many row groups and callers read them directly, not through
    // this fixture helper.)
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val norm =
      if (name == "events") graft.operators.Events.tsAsNanos(raw) else raw
    norm.repartition(spark.sparkContext.defaultParallelism)
  }

  private def sanitize(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9.]+", "_")

  def scratch(sfDir: String, name: String): String =
    s"$ScratchRoot/${sanitize(sfDir)}/$name"

  /** The per-scale-factor "database" dir holding every fixture domain —
    * the catalog root (derive it here; don't re-implement sanitize). */
  def dbRoot(sfDir: String): String = s"$ScratchRoot/${sanitize(sfDir)}"

  /** Build (or reuse) a domain fixture. The builder gets a fresh root. */
  def domain(spark: SparkSession, sfDir: String, name: String, spec: DomainSpec)(
      build: (DomainStore, SparkSession) => Unit): DomainStore =
    built.computeIfAbsent(
      s"${sanitize(sfDir)}/$name",
      _ => {
        val root = scratch(sfDir, name)
        val fs = new Path(root).getFileSystem(conf)
        fs.delete(new Path(root), true) // stale output of a previous JVM
        val store = DomainStore.create(root, spec, conf)
        build(store, spark)
        store
      })

  /** customer as KV: key = big-endian c_custkey, value = utf8 c_name. */
  def customerKv(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer")
      .select(
        long_be(col("c_custkey")).as("key"),
        utf8_bytes(col("c_name")).as("value"))

  /** The flagship customer domain (8 shards, single version 1). */
  def customerDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(spark, sfDir, "customer-8", DomainSpec(numShards = 8)) { (store, s) =>
      store.write(customerKv(s, sfDir), version = 1L)
    }

  /** Two published full versions: v1 values = c_name, v2 values = c_mktsegment. */
  def customerVersionedDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(spark, sfDir, "customer-versions", DomainSpec(numShards = 4)) { (store, s) =>
      store.write(customerKv(s, sfDir), version = 1L)
      store.write(
        table(s, sfDir, "customer").select(
          long_be(col("c_custkey")).as("key"),
          utf8_bytes(col("c_mktsegment")).as("value")),
        version = 2L)
    }

  /** v1 = names for all keys; v2 = upsert of mktsegment for custkey % 3 == 0
    * (untouched shards copy-forward). */
  def customerUpsertDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(spark, sfDir, "customer-upsert", DomainSpec(numShards = 8)) { (store, s) =>
      store.write(customerKv(s, sfDir), version = 1L)
      val delta = table(s, sfDir, "customer")
        .where(col("c_custkey") % 3 === 0)
        .select(
          long_be(col("c_custkey")).as("key"),
          utf8_bytes(col("c_mktsegment")).as("value"))
      store.upsert(s, delta, newVersion = 2L)
    }

  /** MANIFEST-LINKED publish chain on the servable kv format: v1 = full
    * build (names), v2 = linked upsert (mktsegment for custkey % 3 == 0),
    * v3 = linked delete (custkey % 10 == 0). Untouched shards are
    * RECORDED (`_links.json`) instead of copied — the O(delta) publish
    * mode for the 64k-shard regime; reads resolve links transparently. */
  def customerLinkedDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(spark, sfDir, "customer-linked",
      DomainSpec(numShards = 8, persistenceFormat = DomainSpec.KvSorted)) { (store, s) =>
      store.write(customerKv(s, sfDir), version = 1L)
      val delta = table(s, sfDir, "customer")
        .where(col("c_custkey") % 3 === 0)
        .select(
          long_be(col("c_custkey")).as("key"),
          utf8_bytes(col("c_mktsegment")).as("value"))
      store.upsert(s, delta, newVersion = 2L, linked = true)
      val doomed = table(s, sfDir, "customer")
        .where(col("c_custkey") % 10 === 0)
        .select(long_be(col("c_custkey")).as("key"))
      store.delete(s, doomed, newVersion = 3L, linked = true)
    }

  /** v1 = names for all keys; v2 = DELETE of custkey % 10 == 0 (takedown
    * publish — named keys absent, untouched shards copy-forward). */
  def customerDeleteDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(spark, sfDir, "customer-delete", DomainSpec(numShards = 8)) { (store, s) =>
      store.write(customerKv(s, sfDir), version = 1L)
      val doomed = table(s, sfDir, "customer")
        .where(col("c_custkey") % 10 === 0)
        .select(long_be(col("c_custkey")).as("key"))
      store.delete(s, doomed, newVersion = 2L)
    }

  /** 3-shard customer domain resharded to 5 shards (reference reshard!, W6). */
  def customerReshardedDomain(spark: SparkSession, sfDir: String): DomainStore = {
    domain(spark, sfDir, "customer-3", DomainSpec(numShards = 3)) { (store, s) =>
      store.write(customerKv(s, sfDir), version = 1L)
    }
    built.computeIfAbsent(
      s"${sanitize(sfDir)}/customer-5-resharded",
      _ => {
        val dst = scratch(sfDir, "customer-5-resharded")
        val fs = new Path(dst).getFileSystem(conf)
        fs.delete(new Path(dst), true)
        DomainStore.reshard(
          spark,
          scratch(sfDir, "customer-3"),
          dst,
          newNumShards = 5,
          version = 1L,
          conf)
      })
  }

  /** Bloom-indexed customer domain (W5 Indexer SPI): same pairs as
    * [[customerDomain]], plus a per-shard key-bloom sidecar built at
    * publish time, so lookups of absent keys skip the scan entirely. */
  def customerIndexedDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(
      spark, sfDir, "customer-indexed",
      DomainSpec(numShards = 8, indexer = classOf[graft.store.BloomKeyIndexer].getName)) {
      (store, s) => store.write(customerKv(s, sfDir), version = 1L)
    }

  /** customer domain on the orc-sorted persistence format (the second
    * storage engine of the Coordinator SPI, reference S7–S9). */
  def customerOrcDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(
      spark, sfDir, "customer-orc",
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.OrcSorted)) { (store, s) =>
      store.write(customerKv(s, sfDir), version = 1L)
    }

  /** customer domain on the servable kv-sorted local-KV format — per-shard
    * sorted runs + offset index a non-Spark reader binary-searches (the
    * reference's serving deliverable; third storage engine of the SPI). */
  def customerKvFileDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(
      spark, sfDir, "customer-kvfile",
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted)) { (store, s) =>
      store.write(customerKv(s, sfDir), version = 1L)
    }

  /** Orders under a COMPOSITE key `c<custkey>:<orderkey>` (zero-padded
    * decimal, so byte order == numeric order) — the entity‖id layout
    * [[graft.store.DomainStore.prefixScan]] exists for: all orders of
    * one customer are one contiguous prefix run per shard. */
  def ordersCompositeDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(
      spark, sfDir, "orders-composite",
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted)) { (store, s) =>
      store.write(
        table(s, sfDir, "orders").select(
          utf8_bytes(format_string("c%09d:%012d", col("o_custkey"), col("o_orderkey")))
            .as("key"),
          utf8_bytes(round(col("o_totalprice") * 100).cast("long").cast("string"))
            .as("value")),
        version = 1L)
    }

  /** documents domain on the block-compressed `kv-sorted-z` engine —
    * text values are exactly the compressible payload the Deflate blocks
    * exist for (the reference's LevelDB-with-Snappy capability class). */
  def docsKvzDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(
      spark, sfDir, "docs-kvz",
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSortedZ)) { (store, s) =>
      store.write(
        table(s, sfDir, "documents").select(
          long_be(col("doc_id")).as("key"),
          utf8_bytes(col("text")).as("value")),
        version = 1L)
    }

  /** The kv-sorted customer domain TRANSCODED to the compressed engine —
    * the zero-shuffle storage-engine migration path
    * ([[DomainStore.transcode]]): each shard's sorted run streams from
    * the layout-reporting scan straight into the kvz writer. */
  def customerTranscodedDomain(spark: SparkSession, sfDir: String): DomainStore = {
    val src = customerKvFileDomain(spark, sfDir)
    built.computeIfAbsent(
      s"${sanitize(sfDir)}/customer-kvz-transcoded",
      _ => {
        val root = scratch(sfDir, "customer-kvz-transcoded")
        val fs = new Path(root).getFileSystem(conf)
        fs.delete(new Path(root), true)
        DomainStore.transcode(
          spark, src.root.toString, root, DomainSpec.KvSortedZ, version = 1L, conf)
      })
  }

  /** customer kv domain with STRING keys (utf8 of the custkey decimal) —
    * the key form whose md5 routing DuckDB can replay (its md5() is
    * VARCHAR-only, so binary-keyed domains cannot oracle routing math). */
  def customerStrDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(
      spark, sfDir, "customer-strkey",
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted)) { (store, s) =>
      store.write(
        table(s, sfDir, "customer").select(
          utf8_bytes(col("c_custkey").cast("string")).as("key"),
          utf8_bytes(col("c_name")).as("value")),
        version = 1L)
    }

  /** Two full versions of one kv domain for the version-diff surface:
    * v1 = every customer name; v2 drops %7 keys, rewrites %3 values to
    * the market segment, and adds +1000000 keys for %50. */
  def customerDiffDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(
      spark, sfDir, "customer-diff",
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted)) { (store, s) =>
      val c = table(s, sfDir, "customer")
      store.write(
        c.select(long_be(col("c_custkey")).as("key"), utf8_bytes(col("c_name")).as("value")),
        version = 1L)
      val v2 = c.where(col("c_custkey") % 7 =!= 0)
        .select(
          long_be(col("c_custkey")).as("key"),
          utf8_bytes(
            when(col("c_custkey") % 3 === 0, col("c_mktsegment")).otherwise(col("c_name")))
            .as("value"))
        .unionByName(c.where(col("c_custkey") % 50 === 0)
          .select(
            long_be(col("c_custkey") + 1000000).as("key"),
            utf8_bytes(col("c_name")).as("value")))
      store.write(v2, version = 2L)
    }

  /** Per-customer order counts on the servable kv-sorted format, sharded
    * IDENTICALLY to [[customerKvFileDomain]] (same key encoding, same
    * shard count): the second half of the storage-partitioned join pair —
    * joining it with the customer domain through `readPartitioned` needs
    * no shuffle and no sort on either side. */
  def ordersCountKvDomain(spark: SparkSession, sfDir: String): DomainStore =
    domain(
      spark, sfDir, "orders-count-kvfile",
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted)) { (store, s) =>
      store.write(
        table(s, sfDir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"))
          .select(
            long_be(col("o_custkey")).as("key"),
            utf8_bytes(col("n").cast("string")).as("value")),
        version = 1L)
    }

  /** lineitem as KV: key = 12-byte (orderkey BE ++ linenumber BE),
    * value = utf8 l_suppkey — the heavy KV fixture for bench. */
  def lineitemKv(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .select(
        composite_key(long_be(col("l_orderkey")), int_be(col("l_linenumber"))).as("key"),
        utf8_bytes(col("l_suppkey").cast("string")).as("value"))

  def lineitemDomain(spark: SparkSession, sfDir: String): DomainStore =
    // 32 shards = the bench box's core count, so the flagship build's
    // one-task-per-shard write keeps every core busy.
    domain(spark, sfDir, "lineitem-32", DomainSpec(numShards = 32)) { (store, s) =>
      store.write(lineitemKv(s, sfDir), version = 1L)
    }
}
