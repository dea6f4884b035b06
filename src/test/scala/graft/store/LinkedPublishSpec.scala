package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.DomainSpec
import graft.functions._

/** Manifest-linked publish (`DomainStore.patch(linked = true)`): untouched
  * shards are RECORDED (`_links.json`: shard -> physical-host version)
  * instead of copied forward — the O(delta) publish mode for the
  * high-shard-count regime (VERDICT r11 task 2: a 64k-shard daily delta
  * must not push the full corpus through the storage fabric's copy path).
  * The battery pins the whole resolution surface: Spark scans (flatMap kv
  * scan AND the DSv2 layout-reporting scan), point lookups, multiGet,
  * count/shardStats/fsck, versionDiff, the Spark-free serving reader, the
  * localize export, and — the safety half — link-aware GC (cleanup must
  * never reap an origin a kept version links to, including under the
  * served-version keepFloor). */
class LinkedPublishSpec extends SparkSuite {

  private val conf = new Configuration()

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def kv(pairs: (String, String)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("k", "v")
      .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
  }

  private def keysDf(ks: String*): DataFrame = {
    import spark.implicits._
    ks.toDF("k").select(utf8_bytes(col("k")).as("key"))
  }

  private def readPairs(store: DomainStore): Set[(String, String)] =
    store.read(spark)
      .select(bytes_utf8(col("key")), bytes_utf8(col("value")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  private def fileBytes(fs: org.apache.hadoop.fs.FileSystem, p: Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    buf
  }

  private val base: Seq[(String, String)] = (0 until 300).map(i => s"lk$i" -> s"v$i")

  test("linked upsert: O(delta) dirs on disk, full read/lookup parity") {
    val root = scratch("lnk-kv")
    val store = DomainStore.create(root, DomainSpec(8, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk0" -> "NEW", "fresh" -> "added"), 2L, linked = true)

    val fs = store.root.getFileSystem(conf)
    val v2 = new Path(root, "2")
    // the new version dir holds ONLY the rewritten shards + the manifests
    val physical = fs.listStatus(v2).map(_.getPath.getName).filter(_.startsWith("shard=")).toSet
    val links = VersionedStore.readLinks(fs, v2)
    assert(links.nonEmpty, "linked publish must write _links.json")
    assert(physical.size < 8, s"linked publish copied untouched shards: $physical")
    assert(links.keySet.intersect(physical.map(_.stripPrefix("shard=").toInt)).isEmpty,
      "a shard cannot be both physical and linked")
    assert(links.values.toSet === Set(1L), "one-hop links point at the physical host")
    // full logical coverage: every non-empty shard is physical or linked
    assert(physical.map(_.stripPrefix("shard=").toInt) ++ links.keySet ===
      fs.listStatus(new Path(root, "1")).map(_.getPath.getName)
        .filter(_.startsWith("shard=")).map(_.stripPrefix("shard=").toInt).toSet)

    val expected = base.toMap ++ Map("lk0" -> "NEW", "fresh" -> "added")
    assert(readPairs(store) === expected.toSet)
    // DSv2 layout-reporting scan resolves links too
    assert(store.readPartitioned(spark)
      .select(bytes_utf8(col("key")), bytes_utf8(col("value")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet === expected.toSet)
    // Spark-free point get (linked shard + rewritten shard + miss)
    assert(store.get(spark, utf8("lk7")).map(new String(_, "UTF-8")) === Some("v7"))
    assert(store.get(spark, utf8("lk0")).map(new String(_, "UTF-8")) === Some("NEW"))
    assert(store.get(spark, utf8("nope")) === None)
    // multiGet (small batch: kvLookup path)
    val got = store.multiGet(keysDf("lk1", "lk0", "fresh", "ghost"))
      .select(bytes_utf8(col("key")), bytes_utf8(col("value")))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(got === Map("lk1" -> Some("v1"), "lk0" -> Some("NEW"),
      "fresh" -> Some("added"), "ghost" -> None))
    // metadata surfaces resolve links
    assert(store.count(spark) === expected.size.toLong)
    assert(store.shardStats(spark).agg(sum("n_rows")).head().getLong(0) === expected.size.toLong)
    // fsck: every shard audits clean through its resolved dir
    val audit = store.fsck(spark).collect()
    assert(audit.map(_.getLong(1)).sum === expected.size.toLong)
    assert(audit.forall(_.getLong(2) === 0L))
    assert(audit.forall(_.getSeq[String](4).isEmpty))
    // versionDiff cancels linked (untouched) shards row-for-row
    val diff = store.versionDiff(spark, 1L, 2L)
      .select(bytes_utf8(col("key")), col("change")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(diff === Set("lk0" -> "changed", "fresh" -> "added"))
  }

  test("linked chain stays one-hop and a copy-mode publish re-materializes") {
    val root = scratch("lnk-chain")
    val store = DomainStore.create(root, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk1" -> "a2"), 2L, linked = true)
    store.upsert(spark, kv("lk2" -> "a3"), 3L, linked = true)
    store.delete(spark, keysDf("lk3"), 4L, linked = true)
    val fs = store.root.getFileSystem(conf)
    val links4 = VersionedStore.readLinks(fs, new Path(root, "4"))
    // every link points at the version that PHYSICALLY holds the shard —
    // never at an intermediate linked version that doesn't
    links4.foreach { case (s, origin) =>
      assert(fs.exists(new Path(new Path(root, origin.toString), s"shard=$s")),
        s"link target $origin/shard=$s not physical")
    }
    val expected = base.toMap ++ Map("lk1" -> "a2", "lk2" -> "a3") - "lk3"
    assert(readPairs(store) === expected.toSet)

    // copy-mode publish on top of the chain: self-contained again
    store.upsert(spark, kv("back" -> "copy"), 5L)
    assert(VersionedStore.readLinks(fs, new Path(root, "5")).isEmpty)
    val v5shards = fs.listStatus(new Path(root, "5")).map(_.getPath.getName)
      .count(_.startsWith("shard="))
    assert(v5shards === 4, "copy-mode publish must re-materialize every shard")
    assert(readPairs(store) === (expected + ("back" -> "copy")).toSet)
  }

  test("GC keeps link-referenced origins alive; reaps them once unreferenced") {
    val root = scratch("lnk-gc")
    val store = DomainStore.create(root, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk1" -> "a2"), 2L, linked = true)
    store.upsert(spark, kv("lk2" -> "a3"), 3L, linked = true)
    val fs = store.root.getFileSystem(conf)
    store.versions.cleanup(1)
    // keep-newest-1 window is {3}, but 3 links into 1 and 2: both survive
    assert(store.versions.getAllVersions === Seq(3L, 2L, 1L))
    assert(fs.exists(new Path(root, "1")) && fs.exists(new Path(root, "2")))
    assert(readPairs(store).nonEmpty) // still fully readable after GC

    // a self-contained publish drops every reference; cleanup(1) reaps all
    store.upsert(spark, kv("solo" -> "x"), 6L)
    store.versions.cleanup(1)
    assert(store.versions.getAllVersions === Seq(6L))
    assert(!fs.exists(new Path(root, "1")) && !fs.exists(new Path(root, "3")))
    assert(readPairs(store) === (base.toMap ++ Map("lk1" -> "a2", "lk2" -> "a3", "solo" -> "x")).toSet)
  }

  test("compact re-materializes the head: chain fully reaped, reads byte-identical") {
    val root = scratch("lnk-compact")
    val store = DomainStore.create(root, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk1" -> "a2", "fresh" -> "f1"), 2L, linked = true)
    store.delete(spark, keysDf("lk5"), 3L, linked = true)
    store.upsert(spark, kv("lk2" -> "a4"), 4L, linked = true)
    val expected = readPairs(store)
    val fs = store.root.getFileSystem(conf)

    // the retention-valve gauge reads the pinned history exactly: the
    // linked head v4 still references v1 (untouched shards), so the GC
    // fixpoint keeps 3 versions of history — compact is due when this
    // span exceeds retention
    val fp = store.linkFootprint()
    assert(fp.linkedShards > 0 && fp.targetVersions >= 1, fp.toString)
    assert(fp.oldestTarget === 1L, fp.toString)
    assert(fp.pinnedSpan(4L) === 3L)

    // the batch retention valve: one self-contained copy of the head...
    store.compact(5L)
    // ...after which the head pins nothing
    assert(store.linkFootprint() ===
      DomainStore.LinkFootprint(0, 0, 5L))
    assert(store.linkFootprint().pinnedSpan(5L) === 0L)
    assert(VersionedStore.readLinks(fs, store.versions.versionPath(5L)).isEmpty,
      "compacted version must carry no links manifest")
    // ...and cleanup(1) reaps the WHOLE old chain (nothing references it)
    store.versions.cleanup(1)
    assert(store.versions.getAllVersions === Seq(5L))
    Seq(1L, 2L, 3L, 4L).foreach(v =>
      assert(!fs.exists(new Path(root, v.toString)), s"version $v survived the reap"))
    assert(readPairs(store) === expected)
    // point lookups against the compacted head (shard routing + sidecars
    // rode the physical copy)
    assert(store.get(spark, utf8("lk2")).map(new String(_, "UTF-8")) === Some("a4"))
    assert(store.get(spark, utf8("lk5")) === None)
    // provenance: untouched shards keep their last-rewrite origins, so a
    // delta-aware pull that already has them hardlinks (the manifest maps
    // every shard; none may claim the compact version itself as a REWRITE
    // origin for carried bytes)
    val origins = DomainStore.readOriginsAt(fs, store.versions.versionPath(5L))
    assert(origins.nonEmpty && origins.get.nonEmpty)
    assert(origins.get.values.forall(_ < 5L), s"compact rewrote origins: $origins")
  }

  test("GC keepFloor: a served linked version pins its origins too") {
    val root = scratch("lnk-gc-floor")
    val store = DomainStore.create(root, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk1" -> "a2"), 2L, linked = true)
    val reader = KvDomainReader.open(root, conf) // serving v2 (links into v1)
    try {
      store.upsert(spark, kv("solo" -> "x"), 3L) // copy-mode: newest is self-contained
      // the daemon's GC shape: newest-1 window + served-version floor
      store.versions.cleanup(1, keepFloor = reader.servedVersion)
      val fs = store.root.getFileSystem(conf)
      // floor keeps v2; link-aware expansion must keep v2's origin v1
      assert(store.versions.getAllVersions === Seq(3L, 2L, 1L))
      assert(fs.exists(new Path(root, "1")))
      // the served generation still answers from linked shards
      assert(reader.get(utf8("lk7")).map(new String(_, "UTF-8")) === Some("v7"))
    } finally reader.close()
  }

  test("serving reader resolves linked shards: get/multiGet/count/metadata/range") {
    val root = scratch("lnk-serve")
    val store = DomainStore.create(root, DomainSpec(8, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk0" -> "NEW"), 2L, linked = true)
    val reader = KvDomainReader.open(root, conf)
    try {
      assert(reader.servedVersion === 2L)
      assert(reader.get(utf8("lk0")).map(new String(_, "UTF-8")) === Some("NEW"))
      assert(reader.get(utf8("lk42")).map(new String(_, "UTF-8")) === Some("v42"))
      assert(reader.get(utf8("nope")) === None)
      assert(reader.count() === base.size.toLong)
      // census surfaces (pooled trailer sweep) cover linked shards
      assert(reader.shardCounts().map(_._2).sum === base.size.toLong)
      val meta = reader.metadata()
      assert(meta.shards.map(_.records).sum === base.size.toLong)
      // store/serve census parity on a linked version
      val storeCounts = store.shardStats(spark)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      reader.shardCounts().foreach { case (s, n, _) =>
        assert(storeCounts.getOrElse(s, 0L) === n, s"shard $s census drift")
      }
      // global-order range over linked + physical shards
      val page = reader.rangePage(None, true, None, true, maxRecords = 1000,
        maxBytes = Long.MaxValue)
      assert(page.records.size === base.size)
      val lk0 = page.records.find(kvp => new String(kvp._1, "UTF-8") == "lk0").get
      assert(new String(lk0._2, "UTF-8") === "NEW")
    } finally reader.close()
  }

  test("localize of a linked version is self-contained and byte-identical") {
    val root = scratch("lnk-localize")
    val dest = scratch("lnk-localize-out")
    val store = DomainStore.create(root, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk0" -> "NEW"), 2L, linked = true)
    val copied = store.localize(2L, new Path(dest))
    val fs = new Path(dest).getFileSystem(conf)
    val links = VersionedStore.readLinks(fs, new Path(root, "2"))
    assert(links.nonEmpty)
    copied.foreach { s =>
      val out = new Path(dest, s"shard=$s/${KvFile.DataFileName}")
      assert(fs.exists(out), s"localized shard $s missing")
      // bytes match the RESOLVED source (origin dir for linked shards)
      val srcDir = new Path(root, s"${links.getOrElse(s, 2L)}/shard=$s")
      assert(java.util.Arrays.equals(
        fileBytes(fs, out), fileBytes(fs, new Path(srcDir, KvFile.DataFileName))),
        s"shard $s bytes drift")
    }
    // the localized subset serves without the origin dirs
    val reader = KvDomainReader.localized(dest, store.spec, conf)
    try assert(reader.get(utf8("lk0")).map(new String(_, "UTF-8")) === Some("NEW"))
    finally reader.close()
  }

  test("parquet-format linked publish: union scan, pruned multiGet, diff") {
    val root = scratch("lnk-parquet")
    val store = DomainStore.create(root, DomainSpec(8), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk0" -> "NEW", "fresh" -> "added"), 2L, linked = true)
    val expected = base.toMap ++ Map("lk0" -> "NEW", "fresh" -> "added")
    assert(readPairs(store) === expected.toSet)
    assert(store.count(spark) === expected.size.toLong)
    assert(store.get(spark, utf8("lk9")).map(new String(_, "UTF-8")) === Some("v9"))
    val got = store.multiGet(keysDf("lk0", "lk9", "ghost"))
      .select(bytes_utf8(col("key")), bytes_utf8(col("value")))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(got === Map("lk0" -> Some("NEW"), "lk9" -> Some("v9"), "ghost" -> None))
    val diff = store.versionDiff(spark, 1L, 2L)
      .select(bytes_utf8(col("key")), col("change")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(diff === Set("lk0" -> "changed", "fresh" -> "added"))
    val audit = store.fsck(spark).collect()
    assert(audit.map(_.getLong(1)).sum === expected.size.toLong)
  }

  test("fsck flags a lost link target loudly; corrupt manifest fails loud") {
    val root = scratch("lnk-fsck")
    val store = DomainStore.create(root, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk0" -> "NEW"), 2L, linked = true)
    val fs = store.root.getFileSystem(conf)
    val links = VersionedStore.readLinks(fs, new Path(root, "2"))
    val (victim, origin) = links.head
    // simulate a retention misfire: the origin's shard dir vanishes
    fs.delete(new Path(root, s"$origin/shard=$victim"), true)
    val audit = store.fsck(spark).collect().map(r => r.getInt(0) -> r.getSeq[String](4)).toMap
    assert(audit(victim).exists(_.contains("linked shard target missing")),
      s"fsck must flag the lost link target, got ${audit(victim)}")
    // a corrupt manifest must fail loud, never read as 'no links'
    val out = fs.create(new Path(root, s"2/${VersionedStore.LinksFileName}"), true)
    out.write("{broken".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalStateException](
      VersionedStore.readLinks(fs, new Path(root, "2")))
    assert(e.getMessage.contains("corrupt shard-link manifest"))
  }

  test("version-id reuse after an abandoned linked publish serves the fresh bytes") {
    // A linked publish at id N is abandoned (deleteVersion — the
    // failVersion/retry class) and the operator rebuilds N as a FULL
    // build with different values: the links cache on THIS instance must
    // refresh (write() publishes an empty link set), or reads of N would
    // silently resolve untouched shards to the ORIGIN versions' stale
    // bytes — the review-caught staleness class.
    val root = scratch("lnk-reuse")
    val store = DomainStore.create(root, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk0" -> "NEW"), 2L, linked = true)
    store.upsert(spark, kv("lk1" -> "X"), 3L, linked = true)
    assert(store.get(spark, utf8("lk7")).map(new String(_, "UTF-8")) === Some("v7"))
    store.versions.deleteVersion(3L)
    val fresh = (0 until 300).map(i => s"lk$i" -> s"r$i") // every value differs
    store.write(kv(fresh: _*), 3L)
    assert(readPairs(store) === fresh.toSet)
    assert(store.get(spark, utf8("lk7")).map(new String(_, "UTF-8")) === Some("r7"))
    assert(store.count(spark) === fresh.size.toLong)
  }

  test("direct DSv2 read of a linked version resolves links without readPartitioned") {
    // A saved pipeline / fresh JVM reads the version dir through the
    // table provider directly — the driver-side registry never saw a
    // registerLinks for it. The scan must fall back to reading
    // `_links.json` itself at planning, or every linked shard would read
    // as legitimately empty (silent key-absent).
    val root = scratch("lnk-direct")
    val store = DomainStore.create(root, DomainSpec(8, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk0" -> "NEW"), 2L, linked = true)
    val vp = new Path(root, "2").toString
    val df = spark.read
      .format(classOf[graft.sources.KvDomainTableProvider].getName)
      .option("path", vp)
      .option("shards", "8")
      .load()
    val expected = base.toMap ++ Map("lk0" -> "NEW")
    assert(df.select(bytes_utf8(col("key")), bytes_utf8(col("value")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet === expected.toSet)
    // the trailer-fold aggregate pushdown path resolves links too
    assert(df.count() === expected.size.toLong)
  }

  test("pull (localizeVersionForHost) from a linked version is self-contained") {
    val root = scratch("lnk-pull")
    val local = scratch("lnk-pull-local")
    val store = DomainStore.create(root, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(kv(base: _*), 1L)
    store.upsert(spark, kv("lk0" -> "NEW"), 2L, linked = true)
    val ring = ShardRing.generateIndex(Seq("h1"), 4, replication = 1)
    val delta = store.localizeVersionForHost(2L, new Path(local), ring, "h1")
    assert((delta.transferred ++ delta.reused).nonEmpty)
    val fs = new Path(local).getFileSystem(conf)
    // the pulled version dir is physical for every shard — no links file
    assert(VersionedStore.readLinks(fs, new Path(local, "2")).isEmpty)
    val reader = KvDomainReader.open(local, conf)
    try {
      assert(reader.get(utf8("lk0")).map(new String(_, "UTF-8")) === Some("NEW"))
      assert(reader.count() === base.size.toLong)
    } finally reader.close()
  }
}
