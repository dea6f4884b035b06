package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.core.DomainSpec

/** Per-domain metadata readout — the engine's answer to the reference's
  * getDomainMetaData/getMetaData RPCs (core.thrift:45-54,89-90). */
case class DomainMetadata(
    name: String,
    spec: DomainSpec,
    versions: Seq[Long],
    latestVersion: Option[Long],
    failedVersions: Seq[Long] = Nil,
    inFlightVersions: Seq[Long] = Nil) {

  /** A build is in flight (`<v>.building` marker without publish token or
    * failure marker — see `VersionedStore.inFlightVersions`) — the
    * reference's per-domain `update?` answer. */
  def updating: Boolean = inFlightVersions.nonEmpty
  /** Reference status semantics (core.thrift:10-35) mapped to batch: a
    * domain serving at least one published version is "ready" (a later
    * failed update does not unserve it, matching the reference's
    * keep-serving-the-old-version behavior); a domain with no published
    * version is "failed" if an attempt left a failure marker, else
    * "loading". ("shutdown" has no analog without a daemon.) */
  def status: String =
    if (latestVersion.isDefined) "ready"
    else if (failedVersions.nonEmpty) "failed"
    else "loading"
}

/**
 * Catalog over a directory of domains — the batch-engine re-expression of
 * the reference's database/domain enumeration + status surface
 * (getDomains/getStatus/getDomainStatus, SURVEY.md Q8-Q10) and the boot
 * GC (purge-unused-domains!, V10). A "database" here is just a root dir
 * whose children each hold a domain-spec.json.
 */
class DomainCatalog(val root: Path, conf: Configuration) {

  def this(root: String, conf: Configuration) = this(new Path(root), conf)

  private def fs = root.getFileSystem(conf)

  /** Domain names = child dirs carrying a domain-spec.json. */
  def listDomains: Seq[String] = {
    val f = fs
    if (!f.exists(root)) Seq.empty
    else
      f.listStatus(root)
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(n => f.exists(new Path(new Path(root, n), DomainSpec.FileName)))
        .toSeq
        .sorted
  }

  def domain(name: String): DomainStore =
    DomainStore.open(new Path(root, name).toString, conf)

  def metadata(name: String): DomainMetadata = metadata(name, domain(name))

  /** [[metadata]] from an already-open store — for surfaces that need the
    * metadata AND the store (the footprint gauge, shard stats): one
    * DomainStore.open per domain, never a second discarded one. */
  def metadata(name: String, d: DomainStore): DomainMetadata =
    DomainMetadata(
      name, d.spec, d.versions.getAllVersions, d.versions.mostRecentVersion,
      d.versions.failedVersions, d.versions.inFlightVersions)

  def metadataAll: Seq[DomainMetadata] = listDomains.map(metadata)

  /** Every domain serves at least one published version — the reference
    * daemon's `isFullyLoaded` ("can I point traffic here?"). Vacuously
    * true for an empty catalog, matching the reference's all-of-nothing. */
  def isFullyLoaded: Boolean = metadataAll.forall(_.status == "ready")

  /** Any domain has a build in flight — the reference's `isUpdating`. */
  def isUpdating: Boolean = metadataAll.exists(_.updating)

  /** The catalog as a DataFrame — getDomains/getStatus as a SQL surface
    * (register as a temp view and dashboards/joins come free). Driver-side
    * listing, one row per domain: catalogs hold domain counts, not data
    * counts, so local-relation scale is the right scale. */
  def toDf(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // ONE DomainStore.open per domain (open touches the FS): the same
    // instance serves the metadata read and the footprint gauge below —
    // metadataAll would open a second store per domain just to discard it
    listDomains.map(n => (n, domain(n))).map { case (name, d) =>
      val m = metadata(name, d)
      // the retention-valve gauge rides the status surface (one cached
      // manifest read per READY domain): linked_pinned_span > retention
      // window means "compact now" — the ADVICE compaction cadence as a
      // queryable number instead of operator folklore. A PRESENT-but-
      // corrupt _links.json fails loud on every DATA read path by
      // design, but the status surface is where an operator looks to
      // find the sick domain — so HERE it reads as the (-1, -1, -1)
      // sentinel row instead of killing the whole report (pinned span
      // is >= 0 on any readable head, so -1 is unambiguous: fsck it).
      val fp = m.latestVersion.flatMap(v =>
        try Some(d.linkFootprint(v)) catch { case _: Exception => None })
      val corrupt = m.latestVersion.isDefined && fp.isEmpty
      (m.name, m.status, m.spec.numShards, m.spec.persistenceFormat,
        m.latestVersion, m.versions.size, m.failedVersions.size, m.updating,
        fp.map(_.linkedShards).getOrElse(if (corrupt) -1 else 0),
        fp.map(_.targetVersions).getOrElse(if (corrupt) -1 else 0),
        m.latestVersion.flatMap(v => fp.map(_.pinnedSpan(v)))
          .getOrElse(if (corrupt) -1L else 0L))
    }.toDF(
      "domain", "status", "num_shards", "persistence_format",
      "latest_version", "n_versions", "n_failed_versions", "updating",
      "linked_shards", "link_target_versions", "linked_pinned_span")
  }

  /** Reference `update`/`updateAll` semantics: readers resolve the newest
    * published version at plan time, so "refresh" is just re-resolution. */
  def refresh(name: String): Option[Long] = metadata(name).latestVersion

  /** Delete domain dirs not in the keep set (reference
    * purge-unused-domains!, common/database.clj:79-93). */
  def purgeUnused(keep: Set[String]): Seq[String] = {
    val doomed = listDomains.filterNot(keep)
    val f = fs
    doomed.foreach(n => f.delete(new Path(root, n), true))
    doomed
  }

  /** Apply VersionedStore.cleanup to every domain (V5 across the catalog). */
  def cleanupAll(versionsToKeep: Int): Unit =
    listDomains.foreach(n => domain(n).versions.cleanup(versionsToKeep))
}
