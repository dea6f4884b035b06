package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{DomainSpec, Sessions}
import graft.store.{DomainStore, VersionedStore}

/**
 * Dev-only: the mass takedown at the LINKED-PUBLISH 64Ki-SHARD regime
 * (VERDICT r14 task 2). [[DebugTakedownScale]] proves the removal
 * DERIVATION is balanced at 1M hot-bucket ids but publishes onto a
 * handful of shards; THIS runs the other half at the ops regime the
 * engine advertises: a takedown of ≥100k removal ids whose bucket keys
 * touch ≥1k of 65536 shards, against a STUFFED domain (every shard
 * holds filler buckets), published `linked = true`. The legible numbers:
 *
 *  - takedown wall + its heaviest stages (skew ≈ 1 — no straggler);
 *  - the publish bound: `_links.json` must carry the ~63k untouched
 *    shards (O(affected + delta) dir writes, never O(numShards) raw
 *    copies — the copy-forward twin at this regime measured ~122 s of
 *    pure copying for a 1k-key delta, BASELINE r12);
 *  - the emptied group buckets are really GONE from the published head
 *    (the takedown semantics, asserted by full scan);
 *  - `compact` re-materializes the head and the GC fixpoint then reaps
 *    the whole linked chain with the domain staying readable.
 *
 * Fixture: `groups` takedown text groups × `perGroupIndexed` indexed
 * docs (each group's 32 band buckets hold all its docs — live, under
 * the 4096 cap), plus `fillerDocs` unique-text docs whose ~32·filler
 * one-member buckets stuff every shard. The removal set is every group
 * doc plus enough never-indexed docs sharing the group texts to reach
 * `removalIds` — the court-ordered-removal shape (many ids, few texts).
 *
 * Usage: runMain graft.DebugTakedownShardScale [shards=65536] [removalIds=131072]
 */
object DebugTakedownShardScale {
  def main(args: Array[String]): Unit = {
    val shards = args.headOption.map(_.toInt).getOrElse(65536)
    val removalTarget = args.lift(1).map(_.toLong).getOrElse(131072L)
    val groups = 64
    val perGroupIndexed = 512L
    val fillerDocs = 8192L
    require(removalTarget >= groups * perGroupIndexed,
      s"removalIds must be >= ${groups * perGroupIndexed}")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = new org.apache.hadoop.conf.Configuration()

    def timeIt[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[takedown-shards] $what%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    // ~40 distinct words per doc: plenty of shingles for the band kernel
    def groupText(g: Column): Column = concat_ws(" ",
      (1 to 40).map(i => concat(lit("g"), g.cast("string"),
        lit(s"tok$i"), ((g * i) % 13).cast("string"))): _*)
    def fillerText(id: Column): Column = concat_ws(" ",
      (1 to 40).map(i => concat(lit("f"), id.cast("string"),
        lit(s"w$i"), ((id * 31 + i) % 997).cast("string"))): _*)

    val grouped = spark.range(groups * perGroupIndexed).select(
      col("id").as("doc_id"), groupText(col("id") % groups).as("text"))
    val filler = spark.range(fillerDocs).select(
      (col("id") + 100000000L).as("doc_id"), fillerText(col("id")).as("text"))
    val corpus = grouped.unionByName(filler).localCheckpoint(true)

    val root = s"/root/repo/target/takedown-shards-$shards"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    // RESUMABLE at v1 only: the stuffed 64Ki-shard build is the expensive
    // fixture; any later-phase state forces a fresh one (the takedown and
    // compact phases are version-specific)
    val resume = fs.exists(new org.apache.hadoop.fs.Path(root, "1.version")) &&
      (try DomainStore.open(root, conf).latestVersion == 1L
       catch { case _: Exception => false })
    if (!resume) fs.delete(rootPath, true)
    val store =
      if (resume) DomainStore.open(root, conf)
      else DomainStore.create(
        root, DomainSpec(shards, persistenceFormat = DomainSpec.KvSorted), conf)
    println(s"[takedown-shards] shards=$shards removalIds=$removalTarget " +
      s"groups=$groups indexed=${groups * perGroupIndexed} filler=$fillerDocs resume=$resume")
    if (!resume)
      timeIt("index build (stuffed, 64Ki shards)") {
        store.write(operators.Dedup.bandIndexKv(corpus, "doc_id", "text"), 1L)
      }

    val extra = removalTarget - groups * perGroupIndexed
    val removed = grouped.unionByName(
      spark.range(extra).select(
        (col("id") + 200000000L).as("doc_id"),
        groupText(col("id") % groups).as("text")))
      .localCheckpoint(true)

    val group = "takedown-shards"
    val listener = new StageStats(group)
    spark.sparkContext.addSparkListener(listener)
    val wall = try {
      spark.sparkContext.setJobGroup(group, "linked takedown at 64Ki shards")
      val t0 = System.nanoTime()
      operators.Dedup.bandIndexDelete(
        store, removed, "doc_id", "text", 2L, linked = true)
      (System.nanoTime() - t0) / 1e9
    } finally {
      spark.sparkContext.clearJobGroup()
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
    }
    println(f"[takedown-shards] linked takedown of $removalTarget%d ids: wall $wall%7.2f s")
    listener.report("takedown-shards")

    // the publish bound: untouched shards must be LINKS, not copies —
    // affected shards ≈ groups × 32 distinct bucket keys mod 64Ki. The
    // three-way census: linked (carried by manifest) + physically
    // rewritten (the delta) + empty-in-v1 (a stuffed 264k-key domain
    // still leaves ~e^-4 of 65536 shards keyless — never written, so
    // nothing to link) must tile the shard space exactly.
    val links = VersionedStore.readLinks(fs, store.versions.versionPath(2L))
    val physical = fs.listStatus(store.versions.versionPath(2L))
      .count(_.getPath.getName.startsWith("shard="))
    val emptyInV1 = shards - links.size - physical
    println(s"[takedown-shards] v2 manifest: ${links.size} linked (untouched), " +
      s"$physical physically rewritten, $emptyInV1 empty in v1")
    require(physical < 2 * groups * 32,
      s"linked publish rewrote $physical shards — expected ~${groups * 32} affected")
    require(physical >= 1000,
      s"fixture vacuous: only $physical shards rewritten (wanted >= 1k of $shards)")
    require(emptyInV1 >= 0 && emptyInV1 < shards / 16,
      s"shard census does not tile: $emptyInV1 unaccounted")

    // takedown semantics at the head: every group doc id is GONE (their
    // buckets held only group docs, so the keys are absent outright);
    // filler buckets and markers survive
    val survivors = timeIt("full-scan survivor audit") {
      import graft.functions.bytes_utf8
      store.read(spark)
        .where(col("key") =!= lit(operators.IndexMarker.Key))
        .where(col("key") =!= lit(operators.IndexMarker.CapKey))
        .select(explode(split(bytes_utf8(col("value")), ",")).as("entry"))
        .select(col("entry").cast("long").as("id"))
        .agg(
          sum(when(col("id") < 100000000L, 1L).otherwise(0L)),
          count(lit(1))).head()
    }
    require(survivors.getLong(0) == 0L,
      s"${survivors.getLong(0)} removed group ids survive the takedown")
    println(s"[takedown-shards] survivor audit: 0 group ids remain, " +
      s"${survivors.getLong(1)} filler entries intact")

    // the TARGETED certification at the same regime: removalAudit
    // re-derives the removal set's bucket keys and point-probes ONLY
    // those — the O(removals + affected buckets) per-takedown check,
    // vs the full-scan bill above (the fsck). Must certify clean here.
    val certified = timeIt("removalAudit certification") {
      operators.Dedup.bandIndexRemovalAudit(store, removed, "doc_id", "text").count()
    }
    require(certified == 0L,
      s"removalAudit reports $certified surviving/uncertifiable entries")

    // compact re-materializes the head; the GC fixpoint then reaps the
    // whole linked chain — the domain must stay readable throughout
    timeIt("compact(3) re-materialize") { store.compact(3L) }
    require(VersionedStore.readLinks(fs, store.versions.versionPath(3L)).isEmpty,
      "compacted head still carries links")
    timeIt("cleanup(keep=1) reap of the chain") { store.versions.cleanup(1) }
    val c = timeIt("count after reap") { store.count(spark) }
    // keys <= entries (+2 markers): a rare band_hash collision can pack
    // two filler docs into one bucket, so entries bound keys from above
    require(c > fillerDocs && c <= survivors.getLong(1) + 2L,
      s"post-reap count $c outside ($fillerDocs, ${survivors.getLong(1) + 2L}]")
    println(s"[takedown-shards] chain reaped; head readable, count $c")

    fs.delete(rootPath, true)
    println("[takedown-shards] all checks passed; domain deleted")
    spark.stop()
  }
}
