package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{DomainSpec, ShardIndex}
import graft.functions._

/**
 * Metadata-scale smoke at the 100 TB story's cited shard count: a
 * 64k-shard domain (few rows per shard) built, counted, audited,
 * upserted, delta-localized, and served — every path through its
 * DISTRIBUTED branch (numShards far above `DefaultDistributeAbove`),
 * with the plan-time statistics skip pinned by the counting filesystem
 * (O(shards) trailer I/O at planning would be the scale-killer
 * `KvDomainScan.StatsMaxShards` exists to prevent). Slow-ish (~a minute:
 * 64k Spark write tasks on local[8]) but bounded; everything runs on
 * `ramfs://`, nothing touches disk.
 */
class MetadataScaleSpec extends SparkSuite {

  private val auth = "meta64k"
  private val conf = {
    val c = new Configuration()
    CountingRamFs.register(c)
    c
  }
  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("64k-shard domain: write, distributed count/stats/copy-forward, delta pull, serving") {
    import spark.implicits._
    RamFileSystem.clear(auth)
    val n = 65536
    val rows = 131072
    val store = DomainStore.create(
      s"ramfs://$auth/dom", DomainSpec(n, persistenceFormat = DomainSpec.KvSorted), conf)

    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      info(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val keys = (0 until rows).map(i => f"mk$i%06d")
    timed(s"write $rows rows into $n shards") {
      store.write(
        keys.map(k => k -> s"v1-$k").toDF("k", "v")
          .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
        1L)
    }

    // distributed metadata passes: count == rows, stats fold, no skew
    val total = timed("distributed count")(store.count(spark))
    assert(total === rows.toLong)
    val stats = timed("distributed shardStats") {
      store.shardStats(spark)
        .agg(sum("n_rows"), max("n_rows"), sum(when(col("n_rows") === 0, 1L).otherwise(0L)))
        .head()
    }
    assert(stats.getLong(0) === rows.toLong)
    assert(stats.getLong(1) <= 16L, s"md5 routing should spread ~2 rows/shard, max=${stats.getLong(1)}")

    // plan-time statistics SKIPPED above StatsMaxShards: planning a DSv2
    // read of a 64k-shard domain must read ZERO shard-file bytes (the
    // listing is metadata; trailer stats would be ~64k preads)
    val viaCtr = DomainStore.open(s"ctrfs://$auth/dom", conf)
    timed("DSv2 planning at 64k shards (stats skipped)") {
      CountingRamFs.reset(auth)
      val df = viaCtr.readPartitioned(spark).select("key")
      df.queryExecution.executedPlan // force full planning
      assert(CountingRamFs.bytesUnder(s"$auth/dom/1/") === 0L,
        "planning read shard-file bytes — plan-time statistics must skip 64k-shard domains")
    }

    // upsert 5 keys → the other ~64k shards copy-forward through the
    // DISTRIBUTED transfer branch, provenance manifest carried
    val upKeys = keys.take(5)
    val upShards = upKeys.map(k => ShardIndex.shardIndex(utf8(k), n)).toSet
    timed("upsert 5 keys (distributed copy-forward of ~64k shards)") {
      store.upsert(spark,
        upKeys.map(k => k -> s"v2-$k").toDF("k", "v")
          .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
        2L)
    }
    assert(timed("recount after upsert")(store.count(spark)) === rows.toLong)

    // delta-aware serving pull for one host of a 64-host ring: the first
    // pull transfers its ~2k-shard subset, the second reuses everything
    // untouched — zero remote data bytes for reused shards even at this
    // shard count (ONE manifest read, no per-shard probes)
    val ring = ShardRing.generateIndex((0 until 64).map(h => s"h$h"), n, replication = 2)
    val host = "h7"
    val mine = ring.shardSet(host)
    assert(mine.size > 1000, s"host subset ${mine.size}")
    val localRoot = new Path(scratch("meta64k-h7"))
    val d1 = timed(s"initial pull of ${mine.size} shards") {
      viaCtr.localizeVersionForHost(1L, localRoot, ring, host)
    }
    assert(d1.reused.isEmpty)
    CountingRamFs.reset(auth)
    val d2 = timed("delta pull after the 5-key upsert") {
      viaCtr.localizeVersionForHost(2L, localRoot, ring, host)
    }
    assert(d2.transferred.toSet === (mine intersect upShards))
    assert(d2.reused.toSet === ((mine diff upShards) intersect d1.transferred.toSet))
    d2.reused.foreach { s =>
      assert(CountingRamFs.bytesUnder(s"$auth/dom/2/shard=$s") === 0L,
        s"reused shard $s touched the network")
    }

    // Spark-free serving over the 64k-shard subset: refresh-capable
    // reader, bounded handle cache (opens only probed shards), loud
    // misroutes, metadata-only count
    val reader = KvDomainReader.open(localRoot.toString, conf, Some(mine))
    try {
      assert(reader.servedVersion === 2L)
      val probeKeys = keys.filter(k => mine(ShardIndex.shardIndex(utf8(k), n))).take(300)
      assert(probeKeys.nonEmpty)
      timed("300 serving gets over the localized subset") {
        probeKeys.foreach { k =>
          val want = if (upKeys.contains(k)) s"v2-$k" else s"v1-$k"
          assert(reader.get(utf8(k)).map(new String(_, "UTF-8")) === Some(want), k)
        }
      }
      assert(reader.cachedShardReaders <= 300,
        s"handle cache held ${reader.cachedShardReaders} readers for 300 probes — " +
          "a 64k-shard domain must never pin numShards handles")
      val subsetRows = timed("serving count (trailer-tail per shard, open/close per probe)") {
        reader.count()
      }
      // replication 2 over 64 hosts: h7's subset holds ~2/64 of all rows
      assert(subsetRows > 0L && subsetRows < rows.toLong / 8)
      // census surfaces (dashboard shardCounts, wire META) share count()'s
      // pooled kernel — they must agree with it and with each other, and
      // present shards must all lie inside the host's ring subset
      val census = timed("serving shardCounts (pooled census)")(reader.shardCounts())
      assert(census.iterator.map(_._2).sum === subsetRows)
      val present = census.collect { case (s, c, true) => s -> c }.toMap
      assert(present.keySet.subsetOf(mine))
      val meta = timed("serving metadata (wire META census)")(reader.metadata())
      assert(meta.shards.map(si => si.shard -> si.records).toMap === present)
    } finally reader.close()
  }
}
