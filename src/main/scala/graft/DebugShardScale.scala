package graft

import org.apache.spark.sql.functions._

import graft.core.{DomainSpec, Sessions}
import graft.store.DomainStore

/**
 * Dev-only: the 64k-shard OPS-REGIME audit (BASELINE.md r11 — VERDICT r10
 * task 2). README claims numShards 16–64k at 100 TB and every metadata /
 * publish path is two-tier (driver pool below `DefaultDistributeAbove` =
 * 1024 shards, one distributed Spark pass above); this measures the
 * advertised regime END TO END on a real 64Ki-shard kv-sorted domain:
 *
 *   full build → count → shardStats → fsck → 1k-key multiGet →
 *   1k-key upsert publish → 100-key delete publish
 *
 * The cost under audit is PER-SHARD OVERHEAD (task scheduling, dir
 * listings, file-copy fan-out, trailer-tail count reads), not bytes —
 * records are deliberately small (~30 per shard). Every per-shard pass
 * must run in the distributed tier at this shard count (structural:
 * 65536 > 1024); what this audit adds is the measured wall and driver
 * heap so a superlinear or driver-serial regression has a number to
 * diff against. One-shot walls (a build at 64k shards is minutes; the
 * noise band matters less than the magnitude), driver heap sampled
 * after a forced GC per phase.
 *
 * Usage: runMain graft.DebugShardScale [numShards=65536] [keys=2000000]
 */
object DebugShardScale {
  def main(args: Array[String]): Unit = {
    val shards = args.headOption.map(_.toInt).getOrElse(65536)
    val keysN = args.lift(1).map(_.toLong).getOrElse(2_000_000L)
    // the probe set hard-codes ids [1000, 1500) as guaranteed-present and
    // the delete phase removes ids [0, 100) — smaller corpora would fail
    // the self-checks with messages that read like lookup bugs
    require(keysN >= 1600, s"keys must be >= 1600 (probe/delete id ranges), got $keysN")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = new org.apache.hadoop.conf.Configuration()

    def heapMb(): Long = {
      System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }
    def timeIt[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[shard-scale] $what%-34s ${secs}%8.2f s   heap=${heapMb()}%5d MB")
      a
    }

    val root = s"/root/repo/target/shard-scale-domain-$shards"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    // RESUMABLE: a 64k-shard build is tens of minutes on this box (the
    // per-task overhead IS the measurement) — a crashed later phase must
    // not force a rebuild. An existing published v1 is reused; delete
    // the root dir to force a fresh build.
    val fs0 = rootPath.getFileSystem(conf)
    val resume = fs0.exists(new org.apache.hadoop.fs.Path(root, "1.version"))
    val store =
      if (resume) DomainStore.open(root, conf)
      else DomainStore.create(
        root, DomainSpec(shards, persistenceFormat = DomainSpec.KvSorted), conf)
    println(s"[shard-scale] numShards=$shards keys=$keysN " +
      s"(~${keysN / shards} records/shard) heap0=${heapMb()} MB resume=$resume")

    def kvOf(ids: org.apache.spark.sql.DataFrame) = ids.select(
      graft.functions.long_be(col("id")).as("key"),
      graft.functions.utf8_bytes(concat(lit("v"), col("id").cast("string"))).as("value"))

    if (!resume)
      timeIt(s"full build ($keysN keys)") { store.write(kvOf(spark.range(keysN).toDF("id")), 1L) }
    val c1 = timeIt("count (distributed tier)") { store.count(spark) }
    if (store.latestVersion == 1L)
      require(c1 == keysN, s"count after build: $c1 != $keysN")
    val hot = timeIt("shardStats max/sum") {
      store.shardStats(spark)
        .agg(max(col("n_rows")), sum(col("n_rows")), sum(col("n_bytes"))).head()
    }
    println(s"[shard-scale]   hottest shard rows=${hot.getLong(0)} " +
      s"total rows=${hot.getLong(1)} bytes=${hot.getLong(2)}")
    val bad = timeIt("fsck (full integrity pass)") {
      store.fsck(spark).where(
        col("n_misrouted") > 0 || !col("sorted_ok") || size(col("corruption")) > 0).count()
    }
    require(bad == 0L, s"fsck found $bad bad shards")

    // 1k-key batch lookup: 500 present, 500 absent — the point-lookup
    // path (1000 << MaxDriverKeys), one task per probed shard. Present
    // ids start at 1000: ids 0..99 are the delete phase's victims, so a
    // RESUMED run (domain already past the delete) still probes 500 hits
    val probeIds = spark.range(1000, 1500).toDF("id")
      .unionByName(spark.range(500).select((col("id") + keysN * 3).as("id")))
    val probe = probeIds.select(graft.functions.long_be(col("id")).as("key"))
      .localCheckpoint(true)
    val hits = timeIt("multiGet 1k keys (500 hits)") {
      store.multiGet(probe).where(col("value").isNotNull).count()
    }
    require(hits == 500L, s"multiGet hits: $hits != 500")

    // version-relative so a resumed run republishes cleanly
    val v0 = store.latestVersion
    timeIt("upsert publish (1k new keys)") {
      store.upsert(spark,
        kvOf(spark.range(keysN, keysN + 1000L).toDF("id")), v0 + 1)
    }
    timeIt("delete publish (100 keys)") {
      store.delete(spark,
        spark.range(100).select(graft.functions.long_be(col("id")).as("key")), v0 + 2)
    }
    val c3 = timeIt("count after upsert+delete") { store.count(spark) }
    require(c3 == keysN + 1000L - 100L, s"final count: $c3 != ${keysN + 900L}")

    // MANIFEST-LINKED publishes at the same regime (r12 task 2): the
    // copy-forward publishes above pay O(domain) raw copies per publish
    // (~64.5k untouched dirs — the r11 audit measured ~140 s); the
    // linked twins below must be O(delta) — only the affected shards are
    // written, the rest become `_links.json` entries. The SAME key
    // ranges as the copy-forward twins: identical delta sizes keep the
    // walls directly comparable, and re-applying them is count-neutral,
    // so a RESUMED run (whose previous attempt may already have run
    // these phases) still satisfies every count assertion above and
    // below.
    timeIt("LINKED upsert publish (1k keys)") {
      store.upsert(spark,
        kvOf(spark.range(keysN, keysN + 1000L).toDF("id")), v0 + 3, linked = true)
    }
    timeIt("LINKED delete publish (100 keys)") {
      store.delete(spark,
        spark.range(100).select(graft.functions.long_be(col("id")).as("key")),
        v0 + 4, linked = true)
    }
    val c4 = timeIt("count after linked publishes") { store.count(spark) }
    require(c4 == c3, s"linked publishes changed membership: $c4 != $c3")
    // link-aware GC: keep-newest-2 must also keep every origin the kept
    // manifests reference — the domain stays fully readable after the sweep
    timeIt("cleanup(keep=2, link-aware)") { store.versions.cleanup(2) }
    val c5 = timeIt("count after GC") { store.count(spark) }
    require(c5 == c4, s"count after link-aware GC: $c5 != $c4")

    // SERVING half of the regime: a Spark-free reader over the same
    // domain. Open = one listStatus snapshot (never per-shard probes);
    // lookups open one fd per TOUCHED shard, cached for the generation —
    // the full-domain single-process reader is the AUDIT shape only (a
    // real 64k deployment rings subsets across hosts; uniform traffic
    // here would eventually cache one handle per shard, which is exactly
    // the per-box fd budget the ring bounds).
    val reader = timeIt("reader open (snapshot listing)") {
      graft.store.KvDomainReader.open(root, conf)
    }
    try {
      def longBe(v: Long): Array[Byte] =
        java.nio.ByteBuffer.allocate(8).putLong(v).array()
      val probeKeys = (1000L until 2000L).map(longBe)
      val cold = timeIt("reader multiGet 1k (cold fds)") { reader.multiGet(probeKeys) }
      require(cold.count(_.isDefined) == 1000, "reader multiGet missed present keys")
      timeIt("reader multiGet 1k (warm)") { reader.multiGet(probeKeys) }
      // the reader now serves the LINKED head version: every serving
      // surface below also audits link resolution at this shard count
      val rc = timeIt("reader count (trailer tails)") { reader.count() }
      require(rc == c4, s"reader count $rc != store count $c4")
      // serving METADATA surface at the same regime: shardCounts backs the
      // dashboard shard table and censusOf backs the wire META op — both
      // must pool-fan like count() (r12 fix; the serial loop was ~22 s
      // here), so their walls must sit in count()'s band, not 10× it
      val sc = timeIt("reader shardCounts (pooled census)") { reader.shardCounts() }
      require(sc.iterator.map(_._2).sum == c4,
        s"shardCounts sum ${sc.iterator.map(_._2).sum} != count $c4")
      val md = timeIt("reader metadata (wire META census)") { reader.metadata() }
      require(md.shards.iterator.map(_.records).sum == c4,
        s"metadata census sum != count $c4")
      // store/serve census PARITY: the Spark-side shardStats and the
      // serving reader's census must agree per shard, exactly
      val storeRows = store.shardStats(spark)
        .select(col("shard"), col("n_rows")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      sc.foreach { case (s, n, _) =>
        require(storeRows.getOrElse(s, 0L) == n,
          s"census parity: shard $s store=${storeRows.getOrElse(s, 0L)} serve=$n")
      }
      println(s"[shard-scale]   store/serve census parity: ${sc.length} shards agree")
    } finally reader.close()

    // leave no half-million-file tree in target/
    rootPath.getFileSystem(conf).delete(rootPath, true)
    println(s"[shard-scale] all checks passed; domain deleted")
    spark.stop()
  }
}
