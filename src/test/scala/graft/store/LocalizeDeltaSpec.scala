package graft.store

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{DomainSpec, ShardIndex}
import graft.functions._

/**
 * Delta-aware serving pull ([[DomainStore.localizeVersionForHost]]): a
 * copy-forward publish must cost a serving host O(delta) transfer, not a
 * wholesale re-download of its ring subset — unchanged shards reuse the
 * host's previous local version (hardlinked on a local fs), and the
 * [[CountingRamFs]] remote pins that they move no data bytes beyond the
 * bounded tail probe. The reference re-downloaded every assigned shard
 * per version (common/domain.clj:363-405); this is the beat-the-reference
 * half of V7.
 */
class LocalizeDeltaSpec extends SparkSuite {

  private val auth = "ldeltasrc"
  private val conf = {
    val c = new Configuration()
    CountingRamFs.register(c)
    c
  }
  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")
  private val n = 8
  private val hosts = Seq("h1", "h2")

  private def kvDf(pairs: Seq[(String, String)]) = {
    import spark.implicits._
    pairs.toDF("k", "v")
      .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
  }

  /** Every non-checksum file under a dir, relative path → bytes. */
  private def localFiles(dir: String): Map[String, Array[Byte]] = {
    val base = Paths.get(dir)
    if (!Files.exists(base)) return Map.empty
    val out = scala.collection.mutable.Map[String, Array[Byte]]()
    Files.walk(base).forEach { p =>
      val name = p.getFileName.toString
      // skip checksums and the parked provenance manifest (metadata, not
      // shard content — a plain localize ships shard dirs only)
      if (Files.isRegularFile(p) && !name.endsWith(".crc") && !name.startsWith("_"))
        out(base.relativize(p).toString) = Files.readAllBytes(p)
    }
    out.toMap
  }

  test("delta pull: unchanged shards reuse locally (hardlinked), only changed shards move bytes") {
    RamFileSystem.clear(auth)
    CountingRamFs.reset(auth)
    // remote domain written through the normal ramfs pipeline...
    val ramRoot = s"ramfs://$auth/dom"
    val store = DomainStore.create(
      ramRoot, DomainSpec(n, persistenceFormat = DomainSpec.KvSorted), conf)
    val pairs = (0 until 400).map(i => s"dk$i" -> s"v1-$i")
    store.write(kvDf(pairs), 1L)
    // ...but PULLED through the byte-metered alias (same namespace)
    val remote = DomainStore.open(s"ctrfs://$auth/dom", conf)
    val ring = ShardRing.generateIndex(hosts, n, replication = 1)
    val mine = ring.shardSet("h1")
    assume(mine.nonEmpty && mine.size < n, "h1 must host a strict subset")
    val localRoot = new Path(scratch("ldelta-h1"))

    // ---- first pull: no previous version, everything transfers
    val d1 = remote.localizeVersionForHost(1L, localRoot, ring, "h1")
    assert(d1.reused.isEmpty)
    assert(d1.transferred.toSet.subsetOf(mine))
    val reader = KvDomainReader.open(localRoot.toString, conf, Some(mine))
    try {
      assert(reader.servedVersion === 1L)
      val k = pairs.map(_._1).find(k => mine(ShardIndex.shardIndex(utf8(k), n))).get
      assert(reader.get(utf8(k)).map(new String(_, "UTF-8")) === Some("v1-" + k.drop(2)))

      // ---- upsert ONE key routed to a shard h1 hosts → v2 copy-forwards the rest
      val upK = pairs.map(_._1).find(k => mine(ShardIndex.shardIndex(utf8(k), n))).get
      val upShard = ShardIndex.shardIndex(utf8(upK), n)
      store.upsert(spark, kvDf(Seq(upK -> "v2-up")), 2L)

      CountingRamFs.reset(auth)
      val d2 = remote.localizeVersionForHost(2L, localRoot, ring, "h1")
      assert(d2.transferred === Seq(upShard), "only the upserted shard transfers")
      assert(d2.reused.toSet === mine - upShard, "every other hosted shard reuses")

      // counting remote: a reused shard costs ZERO remote bytes (the
      // provenance decision reads one manifest, never shard data — no
      // per-shard probes at all); the changed shard moves its full data
      d2.reused.foreach { s =>
        val read = CountingRamFs.bytesUnder(s"$auth/dom/2/shard=$s")
        assert(read === 0L,
          s"reused shard $s read $read remote bytes — reuse must not touch the network")
      }
      val changedLen = Files.size(
        Paths.get(s"${localRoot}/2/shard=$upShard/${KvFile.DataFileName}"))
      assert(CountingRamFs.bytesUnder(s"$auth/dom/2/shard=$upShard") >= changedLen,
        "the changed shard must actually transfer")

      // reused shards are hardlinks of the previous local version (local fs)
      (d2.reused.take(1)).foreach { s =>
        val prev = Paths.get(s"${localRoot}/1/shard=$s/${KvFile.DataFileName}")
        val cur = Paths.get(s"${localRoot}/2/shard=$s/${KvFile.DataFileName}")
        assert(Files.isSameFile(prev, cur), s"shard $s should hardlink, not copy")
      }

      // byte identity: the delta-pulled subset equals a fresh full localize
      val freshDir = scratch("ldelta-fresh")
      remote.localize(2L, new Path(freshDir), shards = Some(mine.toSeq.sorted))
      val fresh = localFiles(freshDir)
      val mineFiles = localFiles(s"$localRoot/2")
      assert(mineFiles.keySet === fresh.keySet)
      mineFiles.foreach { case (rel, bytes) =>
        assert(java.util.Arrays.equals(bytes, fresh(rel)), s"$rel differs from a full localize")
      }

      // the reader hot-swaps to the pulled version and serves the new value
      assert(reader.refresh() === true)
      assert(reader.servedVersion === 2L)
      assert(reader.get(utf8(upK)).map(new String(_, "UTF-8")) === Some("v2-up"))
      // misroutes stay loud across the swap
      val foreignKey = (0 until 10000).map(i => s"dk$i")
        .find(k => !mine(ShardIndex.shardIndex(utf8(k), n))).get
      val e = intercept[IllegalStateException](reader.get(utf8(foreignKey)))
      assert(e.getMessage.contains("wrong host"), e.getMessage)

      // ---- idempotent re-pull: already published locally → empty delta, no remote bytes
      CountingRamFs.reset(auth)
      val d3 = remote.localizeVersionForHost(2L, localRoot, ring, "h1")
      assert(d3 === DomainStore.LocalizeDelta(Nil, Nil))
      assert(CountingRamFs.bytesUnder(s"$auth/dom") === 0L)

      // ---- retention: a third pull keeps {v3, v2}, reaps local v1
      store.upsert(spark, kvDf(Seq(upK -> "v3-up")), 3L)
      val d4 = remote.localizeVersionForHost(3L, localRoot, ring, "h1")
      assert(d4.transferred === Seq(upShard))
      assert(d4.reused.toSet === mine - upShard)
      val localVs = new VersionedStore(localRoot, conf)
      assert(localVs.getAllVersions === Seq(3L, 2L))
      assert(!Files.exists(Paths.get(s"$localRoot/1")), "local v1 reaped by retention")
      assert(reader.refresh() === true)
      assert(reader.get(utf8(upK)).map(new String(_, "UTF-8")) === Some("v3-up"))
    } finally reader.close()
  }

  test("delta pull guards: foreign local root rejected; throttled pull stays byte-identical") {
    RamFileSystem.clear(auth + "2")
    val c2 = new Configuration(); CountingRamFs.register(c2)
    val store = DomainStore.create(
      s"ramfs://${auth}2/dom", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), c2)
    store.write(kvDf((0 until 100).map(i => s"gk$i" -> s"g$i")), 1L)
    val ring = ShardRing.generateIndex(Seq("hX"), 4, replication = 1)
    // a localRoot already holding a DIFFERENT domain's spec fails loud
    val other = DomainStore.create(
      s"ramfs://${auth}2/other", DomainSpec(16, persistenceFormat = DomainSpec.KvSorted), c2)
    other.write(kvDf(Seq("x" -> "y")), 1L)
    val clash = new Path(scratch("ldelta-clash"))
    other.localizeVersionForHost(
      1L, clash, ShardRing.generateIndex(Seq("hX"), 16, replication = 1), "hX")
    val e = intercept[IllegalArgumentException](
      store.localizeVersionForHost(1L, clash, ring, "hX"))
    assert(e.getMessage.contains("different domain"), e.getMessage)
    // throttled delta pull produces the same bytes as unthrottled
    val a = new Path(scratch("ldelta-throt-a"))
    val b = new Path(scratch("ldelta-throt-b"))
    store.localizeVersionForHost(1L, a, ring, "hX", maxKBps = Some(100000))
    store.localizeVersionForHost(1L, b, ring, "hX")
    val fa = localFiles(s"$a/1"); val fb = localFiles(s"$b/1")
    assert(fa.keySet === fb.keySet && fa.keySet.nonEmpty)
    fa.foreach { case (rel, bytes) => assert(java.util.Arrays.equals(bytes, fb(rel)), rel) }
  }

  test("a shard reaped mid-pull fails the pull loudly; nothing incomplete publishes") {
    RamFileSystem.clear(auth + "3")
    val c3 = new Configuration(); CountingRamFs.register(c3)
    val remote = s"ramfs://${auth}3/dom"
    val store = DomainStore.create(
      remote, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), c3)
    store.write(kvDf((0 until 200).map(i => s"rk$i" -> s"r$i")), 1L)
    val ring = ShardRing.generateIndex(Seq("hY"), 4, replication = 1)
    // simulate retention reaping the version mid-pull: the manifest still
    // names every shard, but one shard dir is gone from the remote — the
    // window between the pull's isPublished check and its copies
    val victim = ring.shardSet("hY").head
    val fs = new Path(remote).getFileSystem(c3)
    assert(fs.delete(new Path(s"$remote/1/shard=$victim"), true))
    val dest = new Path(scratch("ldelta-reaped"))
    val e = intercept[java.io.FileNotFoundException](
      store.localizeVersionForHost(1L, dest, ring, "hY"))
    assert(e.getMessage.contains(s"shard=$victim"), e.getMessage)
    // the failed pull must leave NO published local version (a partial
    // subset serving would answer silent 'key absent' on the lost shard)
    val localVs = new VersionedStore(dest, c3)
    assert(localVs.mostRecentVersion.isEmpty)
    assert(intercept[IllegalStateException](
      KvDomainReader.open(dest.toString, c3)).getMessage.contains("no published version"))
  }
}
