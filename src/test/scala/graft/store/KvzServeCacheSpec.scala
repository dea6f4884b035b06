package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{DomainSpec, ShardIndex}
import graft.functions._

/**
 * Dense serving batches on block-compressed shards must not reload the
 * block index per call: a kvz open eagerly loads the whole index (the
 * exact cost `KvFile.count` was taught to avoid), so
 * [[KvDomainReader.multiGet]]'s merge pass runs on the generation's
 * CACHED reader for positioned-only formats — ONE open per shard per
 * generation, pinned here by the counting filesystem. Plain kv keeps its
 * fresh handle per pass (its iterator owns the seek pointer; its open is
 * a 20-byte trailer read).
 */
class KvzServeCacheSpec extends SparkSuite {

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def build(auth: String, format: String): (Configuration, String, Seq[String]) = {
    import spark.implicits._
    RamFileSystem.clear(auth)
    val conf = new Configuration()
    CountingRamFs.register(conf)
    val store = DomainStore.create(
      s"ramfs://$auth/dom", DomainSpec(2, persistenceFormat = format), conf)
    val keys = (0 until 2000).map(i => s"zk$i")
    store.write(
      keys.map(k => k -> s"val-$k").toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
      1L)
    (conf, s"ctrfs://$auth/dom", keys)
  }

  test("kvz dense multiGet: one shard-file open per generation, not per call") {
    val (conf, root, keys) = build("kvzcache", DomainSpec.KvSortedZ)
    val reader = KvDomainReader.open(root, conf)
    try {
      CountingRamFs.reset("kvzcache")
      val batch = keys.take(1200).map(utf8) // >> blocks per shard → dense branch
      val calls = 8
      (0 until calls).foreach { _ =>
        val got = reader.multiGet(batch)
        batch.zip(got).foreach { case (k, v) =>
          assert(v.map(new String(_, "UTF-8")) === Some("val-" + new String(k, "UTF-8")))
        }
      }
      (0 until reader.numShards).foreach { s =>
        val opens = CountingRamFs.opensUnder(s"kvzcache/dom/1/shard=$s/")
        assert(opens === 1L,
          s"shard $s opened $opens times over $calls dense batches — " +
            "the kvz block index must load once per generation")
      }
      // a refresh-less reader keeps the same generation; lookups still fine
      assert(reader.get(utf8("zk7")).map(new String(_, "UTF-8")) === Some("val-zk7"))
    } finally reader.close()
  }

  test("plain kv dense multiGet: fresh (trailer-only) handle per pass, cached reader for probes") {
    val (conf, root, keys) = build("kvpcache", DomainSpec.KvSorted)
    val reader = KvDomainReader.open(root, conf)
    try {
      CountingRamFs.reset("kvpcache")
      val batch = keys.map(utf8) // every key → dense on plain kv too
      val calls = 3
      (0 until calls).foreach { _ =>
        val got = reader.multiGet(batch)
        assert(got.forall(_.isDefined))
      }
      (0 until reader.numShards).foreach { s =>
        val opens = CountingRamFs.opensUnder(s"kvpcache/dom/1/shard=$s/")
        // 1 cached reader + one fresh handle per dense pass (seek-pointer
        // ownership makes reuse unsafe there; the open is 20 bytes)
        assert(opens === 1L + calls, s"shard $s: $opens opens")
      }
    } finally reader.close()
  }

  test("kvz dense merge on the cached reader is safe under concurrency and refresh") {
    val (conf, root, keys) = build("kvzconc", DomainSpec.KvSortedZ)
    import spark.implicits._
    val store = DomainStore.open(s"ramfs://kvzconc/dom", conf)
    val reader = KvDomainReader.open(root, conf)
    try {
      val batch = keys.take(1500).map(utf8)
      val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
      val threads = (0 until 6).map { t =>
        val th = new Thread(() => {
          (0 until 5).foreach { _ =>
            val got = reader.multiGet(batch)
            batch.zip(got).foreach { case (k, v) =>
              val ks = new String(k, "UTF-8")
              val vs = v.map(new String(_, "UTF-8"))
              // during the roll a value is from v1 or v2, never torn/absent
              if (!(vs.contains(s"val-$ks") || vs.contains(s"neu-$ks")))
                bad.compareAndSet(null, s"$ks -> $vs")
            }
          }
        })
        th.start(); th
      }
      // concurrent publish + hot swap while the dense batches run
      store.upsert(spark,
        keys.take(50).map(k => k -> s"neu-$k").toDF("k", "v")
          .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
        2L)
      reader.refresh()
      threads.foreach(_.join(30000))
      assert(bad.get() === null, Option(bad.get()).getOrElse("ok"))
      assert(reader.servedVersion === 2L)
      assert(reader.get(utf8("zk0")).map(new String(_, "UTF-8")) === Some("neu-zk0"))
    } finally reader.close()
  }
}
