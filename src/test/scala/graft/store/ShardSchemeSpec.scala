package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{DomainSpec, ShardScheme}
import graft.functions._

/** Toy custom scheme for the registry test: first key byte mod n —
  * deliberately nothing like md5, so any site still routing hash-mod
  * under this spec mis-shards visibly. Loaded BY CLASS NAME through
  * [[ShardScheme.forName]] (the reference's DomainSpec.java:46-52
  * class-name indirection), so it needs the public no-arg constructor. */
class FirstByteModScheme extends ShardScheme {
  override def shardIndex(key: Array[Byte], numShards: Int): Int =
    (if (key.isEmpty) 0 else key(0) & 0xFF) % numShards
}

/** The sharding-scheme registry (VERDICT r11 task 3 — the last §2 SPI
  * whose pluggability was narrower than the reference's): a spec may name
  * any `graft.core.ShardScheme` class; every routing site (write
  * sharding, multiGet pruning, point get, fsck's misroute audit, reshard,
  * the Spark-free serving reader) resolves ONE instance, and a foreign
  * name fails loud at spec load. */
class ShardSchemeSpec extends SparkSuite {

  private val conf = new Configuration()
  private val SchemeName = classOf[FirstByteModScheme].getName

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def kv(pairs: (String, String)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("k", "v")
      .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
  }

  private val pairs = (0 until 200).map(i => s"k$i" -> s"v$i")

  test("unregistered scheme names fail loud at spec load") {
    val bare = intercept[IllegalArgumentException](DomainSpec(4, shardScheme = "nonsense").validate())
    assert(bare.getMessage.contains("unknown shardScheme 'nonsense'"))
    val missing = intercept[IllegalArgumentException](
      DomainSpec(4, shardScheme = "com.example.NoSuchScheme").validate())
    assert(missing.getMessage.contains("cannot be instantiated"))
    val illTyped = intercept[IllegalArgumentException](
      DomainSpec(4, shardScheme = "java.lang.Object").validate())
    assert(illTyped.getMessage.contains("does not implement graft.core.ShardScheme"))
    DomainSpec(4).validate() // hash-mod default untouched
    DomainSpec(4, shardScheme = SchemeName).validate() // resolvable class passes
  }

  test("custom scheme: build routes by it, lookups prune by it, fsck audits by it") {
    val store = DomainStore.create(
      scratch("scheme-pq"), DomainSpec(5, shardScheme = SchemeName), conf)
    store.write(kv(pairs: _*), 1L)
    // every row landed on the CUSTOM shard, not the md5 one
    val rows = store.read(spark)
      .select(bytes_utf8(col("key")), col("shard")).collect()
    assert(rows.length === pairs.length)
    rows.foreach { r =>
      assert(r.getInt(1) === (r.getString(0).getBytes("UTF-8")(0) & 0xFF) % 5)
    }
    // the hash-mod-only plan rule must NOT tag this domain's key column
    assert(!store.read(spark).schema("key").metadata
      .contains(graft.plans.ShardPruningRule.NumShardsKey))
    // pruned point lookups route through the scheme (wrong routing would
    // scan the wrong shard dirs and miss present keys)
    import spark.implicits._
    val keys = Seq("k0", "k7", "ghost").toDF("k")
      .select(utf8_bytes(col("k")).as("key"))
    val got = store.multiGet(keys)
      .select(bytes_utf8(col("key")), bytes_utf8(col("value")))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(got === Map("k0" -> Some("v0"), "k7" -> Some("v7"), "ghost" -> None))
    assert(store.get(spark, utf8("k3")).map(new String(_, "UTF-8")) === Some("v3"))
    // fsck audits routing AGAINST THE SCHEME: zero misroutes
    val audit = store.fsck(spark).collect()
    assert(audit.map(_.getLong(1)).sum === pairs.length.toLong)
    assert(audit.map(_.getLong(2)).sum === 0L)
    // upsert routes its delta by the scheme too
    store.upsert(spark, kv("k0" -> "NEW"), 2L)
    assert(store.get(spark, utf8("k0")).map(new String(_, "UTF-8")) === Some("NEW"))
    assert(store.fsck(spark).collect().map(_.getLong(2)).sum === 0L)
  }

  test("custom scheme: reshard preserves pairs and re-routes by the scheme") {
    val (src, dst) = (scratch("scheme-rs-src"), scratch("scheme-rs-dst"))
    val s3 = DomainStore.create(src, DomainSpec(3, shardScheme = SchemeName), conf)
    s3.write(kv(pairs: _*), 1L)
    val s7 = DomainStore.reshard(spark, src, dst, 7, 1L, conf)
    assert(s7.spec.shardScheme === SchemeName)
    val rows = s7.read(spark)
      .select(bytes_utf8(col("key")), col("shard"), bytes_utf8(col("value"))).collect()
    assert(rows.map(r => (r.getString(0), r.getString(2))).toSet === pairs.toSet)
    rows.foreach(r =>
      assert(r.getInt(1) === (r.getString(0).getBytes("UTF-8")(0) & 0xFF) % 7))
  }

  test("custom scheme: kv-sorted build serves through the Spark-free reader") {
    val root = scratch("scheme-kv")
    val store = DomainStore.create(
      root, DomainSpec(4, shardScheme = SchemeName, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(pairs: _*), 1L)
    val reader = KvDomainReader.open(root, conf)
    try {
      assert(reader.get(utf8("k11")).map(new String(_, "UTF-8")) === Some("v11"))
      assert(reader.get(utf8("ghost")) === None)
      val got = reader.multiGet(Seq(utf8("k1"), utf8("k2"), utf8("nope")))
      assert(got.map(_.map(new String(_, "UTF-8"))) ===
        IndexedSeq(Some("v1"), Some("v2"), None))
      assert(reader.count() === pairs.length.toLong)
      // an in-process ring serves it when given the resolved scheme
      val ring = ShardRing.generateIndex(Seq("h1"), 4, replication = 1)
      val client = new RingClient(ring, Map("h1" -> (reader: ServingReader)),
        scheme = ShardScheme.forName(SchemeName))
      assert(client.get(utf8("k5")).map(new String(_, "UTF-8")) === Some("v5"))
      assert(client.multiGet(Seq(utf8("k6"), utf8("zz-none")))
        .map(_.map(new String(_, "UTF-8"))) === IndexedSeq(Some("v6"), None))
    } finally reader.close()
  }
}
