package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Versioned directory store on a Hadoop FileSystem — same layout and
 * semantics as the reference's VersionedStore
 * (elephantdb-core/src/jvm/elephantdb/store/VersionedStore.java):
 *
 *   <root>/<version>/...          data of one immutable version
 *   <root>/<version>.version      empty token; its existence IS the publish
 *
 * A version is visible to readers iff its token exists (succeedVersion,
 * VersionedStore.java:102-108). Readers resolve `mostRecentVersion` at plan
 * time, giving per-query snapshot isolation with no locking — the Spark-side
 * replacement for the reference's read-lock/hot-swap machinery
 * (SURVEY.md §3.3).
 *
 * Version ids are caller-supplied longs (the reference uses
 * currentTimeMillis at the call site, VersionedStore.java:78-80); the engine
 * never reads the clock, keeping runs reproducible.
 */
class VersionedStore(val root: Path, conf: Configuration) {

  def this(root: String, conf: Configuration) = this(new Path(root), conf)

  private[store] def fs: FileSystem = root.getFileSystem(conf)

  def versionPath(version: Long): Path = new Path(root, version.toString)
  private def tokenPath(version: Long): Path = new Path(root, s"$version.version")

  /** Modification time of a published version's token file — a cheap
    * (one getFileStatus, no data reads) fingerprint of WHICH publish a
    * version id refers to: a delete+rebuild at the same version id gets
    * a fresh token with a new mtime, so caches keyed on (root, version,
    * tokenMtime) can never serve the old build's answer. */
  def tokenMtime(version: Long): Long =
    fs.getFileStatus(tokenPath(version)).getModificationTime
  private def failedPath(version: Long): Path = new Path(root, s"$version.failed")
  private def buildingPath(version: Long): Path = new Path(root, s"$version.building")

  /** Allocate a new (unpublished) version dir; rejects an already-published
    * id and clears any leftover partial dir (VersionedStore.java:78-91).
    * A stale failure marker for the id is cleared — a new attempt means
    * the version is loading again, not failed. */
  def createVersion(version: Long): Path = {
    val f = fs
    require(!f.exists(tokenPath(version)), s"version $version already exists at $root")
    val p = versionPath(version)
    if (f.exists(p)) f.delete(p, true)
    f.delete(failedPath(version), false)
    f.mkdirs(root)
    // The data dir itself must NOT pre-exist (the parquet committer runs
    // ErrorIfExists), so the "build in flight" state gets its own marker
    // — created here, cleared by succeed/fail/delete; a crashed build
    // stays visibly in flight until an explicit resolution, the
    // reference updater's `updating` semantics ([[inFlightVersions]]).
    f.create(buildingPath(version), true).close()
    p
  }

  /** Atomically publish: create the token file (VersionedStore.java:102-108).
    * ORDER IS LOAD-BEARING: the token is created BEFORE the `.building`
    * marker is deleted, so at every instant the version is protected
    * from a concurrent [[cleanup]] by at least one of the two — marker
    * (in-flight retention) or token (the keep window). The old
    * delete-marker-then-create-token order opened a window where a
    * racing cleanup saw neither, reaped the fully-built data dir, and
    * the subsequent token create published an EMPTY version (silent
    * key-absent for every key). */
  def succeedVersion(version: Long): Unit = {
    val f = fs
    f.mkdirs(versionPath(version))
    f.create(tokenPath(version), true).close()
    f.delete(failedPath(version), false)
    f.delete(buildingPath(version), false)
  }

  /** Abort/unpublish: delete data dir and token (VersionedStore.java:93-100)
    * and leave a `<version>.failed` marker so the failure stays visible in
    * the catalog — the batch analog of the reference's `failed` domain
    * status (common/status.clj:17-35, core.thrift:10-35), which otherwise
    * has no trace once the partial dir is reaped. */
  def failVersion(version: Long): Unit = {
    deleteVersion(version)
    fs.create(failedPath(version), true).close()
  }

  /** Versions whose build failed (marker present, never re-attempted or
    * succeeded since), newest first. */
  def failedVersions: Seq[Long] = {
    val f = fs
    if (!f.exists(root)) Seq.empty
    else
      f.listStatus(root)
        .iterator
        .map(_.getPath.getName)
        .filter(_.endsWith(".failed"))
        .flatMap(_.stripSuffix(".failed").toLongOption)
        .toSeq
        .sorted(Ordering[Long].reverse)
  }

  /** Version ids whose `.building` marker is present without a publish
    * token or failure marker — builds in flight right now (or crashed
    * without the failVersion path; they stay visibly in flight until an
    * explicit resolution), newest first. The batch analog of the
    * reference daemon's `isUpdating` state. */
  def inFlightVersions: Seq[Long] = {
    val f = fs
    if (!f.exists(root)) Seq.empty
    else {
      val names = f.listStatus(root).map(_.getPath.getName)
      val building = names.filter(_.endsWith(".building"))
        .flatMap(_.stripSuffix(".building").toLongOption).toSet
      val tokens = names.filter(_.endsWith(".version"))
        .flatMap(_.stripSuffix(".version").toLongOption).toSet
      val failed = names.filter(_.endsWith(".failed"))
        .flatMap(_.stripSuffix(".failed").toLongOption).toSet
      (building -- tokens -- failed).toSeq.sorted(Ordering[Long].reverse)
    }
  }

  /** Remove every trace of a version: data, token, and failure marker
    * (an explicit delete means "forget this id", including its failure). */
  def deleteVersion(version: Long): Unit = {
    val f = fs
    f.delete(versionPath(version), true)
    f.delete(tokenPath(version), false)
    f.delete(failedPath(version), false)
    f.delete(buildingPath(version), false)
  }

  /** Cheap publish check: one token-existence probe, no directory listing
    * (the hot-path guard for every read). */
  def isPublished(version: Long): Boolean = fs.exists(tokenPath(version))

  /** Published versions, newest first (VersionedStore.java:64-76). Foreign
    * `*.version` files (editor backups, ops tooling) are ignored rather
    * than bricking every read, matching cleanup's tolerance. */
  def getAllVersions: Seq[Long] = {
    val f = fs
    if (!f.exists(root)) Seq.empty
    else
      f.listStatus(root)
        .iterator
        .map(_.getPath.getName)
        .filter(_.endsWith(".version"))
        .flatMap(_.stripSuffix(".version").toLongOption)
        .toSeq
        .sorted(Ordering[Long].reverse)
  }

  def mostRecentVersion: Option[Long] = getAllVersions.headOption

  /** Newest published version <= maxVersion (VersionedStore.java:140-146). */
  def mostRecentVersion(maxVersion: Long): Option[Long] =
    getAllVersions.find(_ <= maxVersion)

  /** Keep the newest `versionsToKeep` published versions; delete the rest
    * and reap never-published partial dirs (VersionedStore.java:110-127).
    * Failure markers age out with the same retention window: a marker
    * older than the oldest kept published version is stale history and is
    * reaped; newer markers (including ones newer than the latest publish)
    * stay visible — they are the catalog's evidence of recent failures. */
  def cleanup(versionsToKeep: Int): Unit = cleanupImpl(versionsToKeep, None)

  /** [[cleanup]] with a FLOOR: versions >= `keepFloor` survive even when
    * they fall outside the newest-N window. The serving daemon's GC
    * passes its currently-served version here — without the floor, a
    * publish landing between the reader's swap and this listing would
    * push the SERVED version out of the newest-N window and reap the
    * files every in-flight lookup reads (a serving outage, not the
    * documented drain case). The floor is evaluated against THIS call's
    * own listing, so the guard cannot race the publish it defends
    * against. */
  def cleanup(versionsToKeep: Int, keepFloor: Long): Unit =
    cleanupImpl(versionsToKeep, Some(keepFloor))

  private def cleanupImpl(versionsToKeep: Int, keepFloor: Option[Long]): Unit = {
    val f = fs
    if (!f.exists(root)) return
    // ONE listing drives BOTH the keep-set and the deletions: deriving
    // keep from a separate getAllVersions listing opened a TOCTOU where
    // a version published between the two listings (token present,
    // building marker already gone) was absent from the stale keep-set
    // and got reaped — GC destroying the newest publish.
    val listed = f.listStatus(root).map(_.getPath.getName)
    val all = listed.iterator
      .filter(_.endsWith(".version"))
      .flatMap(_.stripSuffix(".version").toLongOption)
      .toSeq
      .sorted(Ordering[Long].reverse)
    val windowSeq =
      (all.take(versionsToKeep) ++
        keepFloor.map(fl => all.filter(_ >= fl)).getOrElse(Nil))
        .distinct.sortBy(-_)
    // Link-aware retention: a manifest-linked publish (DomainStore.patch
    // with linked = true) records untouched shards as `shard -> origin
    // version` in `_links.json` instead of copying their dirs forward, so
    // a kept version's DATA may physically live in older version dirs.
    // The keep set therefore expands to the fixpoint of every kept
    // version's link targets — reaping a referenced origin would turn
    // every key routed to a linked shard into a silent 'key absent'.
    // This lives HERE, not in a DomainStore wrapper, so every cleanup
    // caller (serving daemons, catalogs, pull-side reapers) is safe by
    // construction; the cost is one small manifest read per kept version
    // per sweep. Versions kept only as link targets are kept WHOLE
    // (dir + token) — GC granularity is the version.
    var keep = windowSeq.toSet
    var frontier = keep
    while (frontier.nonEmpty) {
      val refs = frontier.iterator
        .flatMap(v => VersionedStore.readLinks(f, versionPath(v)).values)
        .toSet.diff(keep)
      keep ++= refs
      frontier = refs
    }
    val keepSeq = keep.toSeq.sortBy(-_)
    val oldestKept = keepSeq.lastOption
    // belt over the single-listing braces: version ids are monotone by
    // convention (every publish path takes newVersion > latest), so
    // anything ABOVE the newest kept publish is a fresh publish or an
    // in-flight build, never the garbage cleanup exists to reap —
    // deletions apply only below the window top.
    //
    // DELIBERATE BOUNDED LEAK (ADVICE r10): a build that crashes without
    // failVersion leaves its marker + partial dir ABOVE the window, and
    // this guard never reaps them — cleanup cannot distinguish "crashed"
    // from "still running a 12-hour bulk load", and time-based aging
    // would destroy legitimately slow in-flight builds (silent empty-
    // version publish, the worst failure class this store has). The
    // leak is VISIBLE (inFlightVersions lists it until resolved), at
    // most one partial dir per crashed attempt, explicitly reclaimable
    // (failVersion/deleteVersion — the documented resolution, see
    // createVersion), and self-healing under traffic: once versionsToKeep
    // later publishes push oldestKept above the crashed id, the marker
    // ages out and the dir branch reaps the data. Only an ABANDONED
    // store retains it indefinitely — and an abandoned store's garbage
    // is purgeDomain's job, not cleanup's.
    val newestKept = keepSeq.headOption
    locally {
      // .building markers INSIDE their retention window mark builds in
      // flight: their data dirs must survive cleanup, or the marker pins
      // isUpdating=true on a dataless build and the eventual
      // succeedVersion publishes an EMPTY version (silent key-absent for
      // every key). Markers BELOW the window age out like failed markers
      // — a LOWER-id build racing cleanup has always been destructive;
      // don't run one.
      val inFlightKept = listed.iterator
        .filter(_.endsWith(".building"))
        .flatMap(_.stripSuffix(".building").toLongOption)
        .filterNot(v => oldestKept.exists(v < _))
        .toSet
      listed.foreach { name =>
        if (name.endsWith(".failed")) {
          name.stripSuffix(".failed").toLongOption.foreach { v =>
            if (oldestKept.exists(v < _)) f.delete(failedPath(v), false)
          }
        } else if (name.endsWith(".building")) {
          // a build that crashed BEFORE its first output leaves only the
          // marker (no dir for the dir branch to reap) — age it out like
          // failed markers, or isUpdating pins true forever
          name.stripSuffix(".building").toLongOption.foreach { v =>
            if (oldestKept.exists(v < _)) f.delete(buildingPath(v), false)
          }
        } else {
          val version =
            if (name.endsWith(".version")) name.stripSuffix(".version").toLongOption
            else name.toLongOption
          version.foreach { v =>
            if (!keep.contains(v) && !inFlightKept.contains(v) &&
                !newestKept.exists(v > _)) deleteVersion(v)
          }
        }
      }
    }
  }
}

object VersionedStore {

  /** Per-version shard-link manifest, `<version>/_links.json`: for each
    * logically-present shard whose `shard=<i>` dir is NOT in this version
    * dir, the (older) version whose dir physically holds it — written by
    * manifest-linked publishes (`DomainStore.patch(linked = true)`), which
    * record untouched shards instead of copying them forward. Targets are
    * always PHYSICAL hosts (one-hop: a linked publish on top of a linked
    * version re-points at the original host, never at the intermediate
    * link). Absent ⟹ no linked shards (every copy-mode / legacy version).
    * The underscore prefix hides it from Spark file indexes, like
    * `_origins.json`. */
  val LinksFileName = "_links.json"

  /** ONE serializer/parser pair for the two shard→version manifests
    * (`_origins.json`, `_links.json`): their READ policies deliberately
    * differ (corrupt origins degrade to "transfer everything"; corrupt
    * links fail loud), but two copies of the codec could drift — a
    * formatting change landing in one would make the other's reader
    * reject (or misread) its sibling's bytes. */
  private[store] def shardMapToJson(m: Map[Int, Long]): String =
    m.toSeq.sorted.map { case (s, v) => s""""$s":$v""" }.mkString("{", ",", "}")

  private[store] def shardMapFromJson(s: String): Map[Int, Long] = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) Map.empty
    else body.split(",").iterator.map { e =>
      val Array(k, v) = e.split(":").map(_.trim)
      k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
    }.toMap
  }

  private[store] def linksToJson(m: Map[Int, Long]): String = shardMapToJson(m)

  /** Shard links of a version dir. Absent file = no linked shards. A
    * PRESENT-BUT-UNPARSEABLE manifest fails LOUD: treating it as empty
    * would silently read every linked shard as an empty shard (key
    * absent for every key routed there) — the one failure mode a
    * versioned KV store must never produce. Contrast `_origins.json`,
    * where a corrupt manifest safely degrades to "transfer everything". */
  def readLinks(fs: FileSystem, versionDir: Path): Map[Int, Long] = {
    val p = new Path(versionDir, LinksFileName)
    val existing =
      try { if (fs.exists(p)) Some(fs.getFileStatus(p).getLen.toInt) else None }
      catch { case _: java.io.FileNotFoundException => None }
    existing match {
      case None => Map.empty
      case Some(len) =>
        val buf = new Array[Byte](len)
        val in = fs.open(p)
        try in.readFully(0L, buf)
        finally in.close()
        try {
          val m = shardMapFromJson(new String(buf, "UTF-8"))
          m.foreach { case (shard, origin) =>
            require(shard >= 0 && origin >= 0, s"negative shard/origin in $p")
          }
          m
        } catch {
          case e: Exception => throw new IllegalStateException(
            s"corrupt shard-link manifest $p — refusing to read the version " +
              "(an empty link set would silently serve 'key absent' for " +
              "every linked shard); restore the manifest or re-publish", e)
        }
    }
  }
}
