package graft.store

import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{DomainSpec, ShardIndex}
import graft.functions._

/**
 * The reference's complete update cycle (`update`/`updateAll`,
 * core.thrift:86-87, common/database.clj:45-57: download the new version
 * to every host, then swap each server) as [[RingClient.updateRing]]:
 * delta-aware versioned pull per host + per-reader hot-swap, hosts rolled
 * sequentially while queries keep flowing. Mixed versions DURING the roll
 * are legal (they were in the reference too); what must hold is that
 * every answer comes from a COMPLETE published version — old or new
 * value, never a failure, never a torn read.
 */
class RingUpdateSpec extends SparkSuite {

  private val auth = "ringupd"
  private val conf = new Configuration()
  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private val n = 5
  private val hosts = Seq("rA", "rB", "rC")
  private val keys = (0 until 300).map(i => s"rk$i")

  private def kvDf(pairs: Seq[(String, String)]) = {
    import spark.implicits._
    pairs.toDF("k", "v")
      .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
  }

  test("staggered 3-host roll: every answer from a complete version, zero failures") {
    RamFileSystem.clear(auth)
    val store = DomainStore.create(
      s"ramfs://$auth/dom", DomainSpec(n, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kvDf(keys.map(k => k -> s"v1-$k")), 1L)
    val ring = ShardRing.generateIndex(hosts, n, replication = 2)
    val hostRoots = hosts.map(h => h -> new Path(scratch(s"ringupd-$h"))).toMap

    // initial pull + versioned readers (refresh-capable, misroutes loud)
    hosts.foreach(h => store.localizeVersionForHost(1L, hostRoots(h), ring, h))
    val readers = hosts.map { h =>
      h -> KvDomainReader.open(hostRoots(h).toString, conf, Some(ring.shardSet(h)))
    }.toMap
    val client = new RingClient(ring, readers, rnd = new scala.util.Random(11))
    try {
      // v2 rewrites a SUBSET of keys (one upsert batch → some shards
      // change, the rest copy-forward → the pull reuses them)
      val changed = keys.filter(_.hashCode % 3 == 0)
      assume(changed.nonEmpty && changed.size < keys.size)
      store.upsert(spark, kvDf(changed.map(k => k -> s"v2-$k")), 2L)

      // hammer the ring from 4 threads for the whole roll
      val stop = new AtomicBoolean(false)
      val violation = new AtomicReference[String](null)
      val threads = (0 until 4).map { t =>
        val th = new Thread(() => {
          val rnd = new scala.util.Random(100 + t)
          while (!stop.get() && violation.get() == null) {
            try {
              val batch = Seq.fill(20)(keys(rnd.nextInt(keys.length)))
              val got = client.multiGet(batch.map(utf8))
              batch.zip(got).foreach { case (k, v) =>
                val s = v.map(new String(_, "UTF-8"))
                val legal =
                  if (changed.contains(k)) s.contains(s"v1-$k") || s.contains(s"v2-$k")
                  else s.contains(s"v1-$k")
                if (!legal) violation.compareAndSet(null,
                  s"key $k answered $s — not a value from any complete version")
              }
            } catch {
              case e: Exception =>
                violation.compareAndSet(null, s"query failed mid-roll: $e")
            }
          }
        })
        th.setDaemon(true); th.start(); th
      }

      // the roll itself: sequential per-host pull + swap
      val deltas = RingClient.updateRing(client, store, 2L, ring, hostRoots)
      Thread.sleep(150) // let the hammers observe the fully-rolled ring
      stop.set(true)
      threads.foreach(_.join(10000))
      assert(violation.get() === null, Option(violation.get()).getOrElse("ok"))

      // after the roll: every host serves v2, reuse did the heavy lifting
      readers.foreach { case (h, r) => assert(r.servedVersion === 2L, s"host $h") }
      assert(client.refreshAll().values.forall(_ == false), "already newest everywhere")
      val changedShards = changed.map(k => ShardIndex.shardIndex(utf8(k), n)).toSet
      deltas.foreach { case (h, d) =>
        assert(d.transferred.toSet === (ring.shardSet(h) intersect changedShards), s"host $h")
        assert(d.reused.toSet === (ring.shardSet(h) diff changedShards), s"host $h")
      }
      // post-roll reads are all-new
      val got = client.multiGet(keys.map(utf8)).map(_.map(new String(_, "UTF-8")))
      keys.zip(got).foreach { case (k, v) =>
        val want = if (changed.contains(k)) s"v2-$k" else s"v1-$k"
        assert(v === Some(want), s"key $k after the roll")
      }
    } finally client.close()
  }

  /** A delegate whose served-version PROBE fails its first `failFirst`
    * calls (alive-but-slow read timeout), then recovers — the ADVICE
    * scenario: the floor probe must not silently degrade to a
    * floor-less cleanup. */
  private final class FlakyProbeReader(inner: ServingReader, failFirst: Int)
      extends ServingReader {
    private var calls = 0
    def numShards: Int = inner.numShards
    def servedVersion: Long = {
      calls += 1
      if (calls <= failFirst)
        throw new java.io.IOException(s"served-version probe timed out (call $calls)")
      inner.servedVersion
    }
    def get(key: Array[Byte]): Option[Array[Byte]] = inner.get(key)
    def multiGet(keys: Seq[Array[Byte]]): IndexedSeq[Option[Array[Byte]]] =
      inner.multiGet(keys)
    def count(): Long = inner.count()
    def canRefresh: Boolean = inner.canRefresh
    def refresh(): Boolean = inner.refresh()
    def close(): Unit = inner.close()
  }

  test("updateRing floor-probe failure: one retry, then the roll SKIPS the local reap " +
      "(a floor-less cleanup would reap the version still being served)") {
    RamFileSystem.clear("ringupdfloor")
    val store = DomainStore.create(
      s"ramfs://ringupdfloor/dom", DomainSpec(n, persistenceFormat = DomainSpec.KvSorted), conf)
    val host = "rF"
    val ring = ShardRing.generateIndex(Seq(host), n, replication = 1)
    val root = new Path(scratch("ringupd-floor"))
    val roots = Map(host -> root)
    store.write(kvDf(keys.map(k => k -> s"v1-$k")), 1L)
    store.localizeVersionForHost(1L, root, ring, host)
    val reader = KvDomainReader.open(root.toString, conf, Some(ring.shardSet(host)))
    val flaky = new FlakyProbeReader(reader, failFirst = 2) // probe + its one retry
    val client = new RingClient(ring, Map(host -> (flaky: ServingReader)),
      rnd = new scala.util.Random(13))
    try {
      // build up local {1, 2} with the reader STALLED on v1 (no refresh):
      // the exact shape where keep-newest-2 slides past the served version
      store.upsert(spark, kvDf(keys.take(3).map(k => k -> s"v2-$k")), 2L)
      store.localizeVersionForHost(2L, root, ring, host, keepFloor = 1L)
      store.upsert(spark, kvDf(keys.take(3).map(k => k -> s"v3-$k")), 3L)
      assert(reader.servedVersion === 1L, "fixture: reader stalled on v1")
      RingClient.updateRing(client, store, 3L, ring, roots)
      val localVs = new VersionedStore(root, conf)
      // the probe failed (twice): NO reap this roll — v1, the version the
      // reader was serving when the pull started, must survive (an
      // un-floored cleanup(keep=2) would have kept only {2, 3})
      assert(localVs.getAllVersions.toSet === Set(1L, 2L, 3L),
        "probe-failure roll must skip the local reap entirely")
      assert(reader.servedVersion === 3L, "the swap itself still happened")
      // next roll: the probe works again → the floored cleanup resumes
      // (keep newest 2, floor = served 3) and reaps the backlog
      store.upsert(spark, kvDf(keys.take(3).map(k => k -> s"v4-$k")), 4L)
      RingClient.updateRing(client, store, 4L, ring, roots)
      assert(localVs.getAllVersions.toSet === Set(3L, 4L),
        "recovered probe must resume the floored reap")
      assert(reader.servedVersion === 4L)
    } finally client.close()
  }
}
