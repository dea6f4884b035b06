package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.DomainSpec
import graft.functions._

class DomainCatalogSpec extends SparkSuite {

  private val conf = new Configuration()

  private def kv(pairs: (String, String)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
      .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
  }

  test("list, metadata, status, purge, cleanupAll") {
    val root = scratch("catalog")
    val a = DomainStore.create(s"$root/alpha", DomainSpec(2), conf)
    a.write(kv("a" -> "1"), 1L)
    a.write(kv("a" -> "2"), 2L)
    val b = DomainStore.create(s"$root/beta", DomainSpec(4), conf)
    b.versions.createVersion(1L) // never published -> "loading"

    val cat = new DomainCatalog(root, conf)
    assert(cat.listDomains === Seq("alpha", "beta"))

    val ma = cat.metadata("alpha")
    assert(ma.spec === DomainSpec(2))
    assert(ma.versions === Seq(2L, 1L))
    assert(ma.latestVersion === Some(2L))
    assert(ma.status === "ready")
    assert(cat.metadata("beta").status === "loading")
    assert(cat.refresh("alpha") === Some(2L))

    cat.cleanupAll(1)
    assert(cat.metadata("alpha").versions === Seq(2L))

    assert(cat.purgeUnused(Set("alpha")) === Seq("beta"))
    assert(cat.listDomains === Seq("alpha"))
  }

  test("catalog as a DataFrame: one row per domain, SQL-queryable status") {
    val root = scratch("catalog-df")
    val a = DomainStore.create(s"$root/alpha", DomainSpec(2), conf)
    a.write(kv("a" -> "1"), 1L)
    a.write(kv("a" -> "2"), 2L)
    DomainStore.create(s"$root/beta", DomainSpec(4), conf)
      .versions.createVersion(1L) // never published -> loading
    val df = new DomainCatalog(root, conf).toDf(spark)
    df.createOrReplaceTempView("graft_domains")
    val got = spark.sql(
      """SELECT domain, status, num_shards, latest_version, n_versions
        |FROM graft_domains ORDER BY domain""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getInt(4)))
    assert(got.toSeq === Seq(
      ("alpha", "ready", 2, Some(2L), 2),
      ("beta", "loading", 4, None, 0)))
    // the retention gauge columns: self-contained alpha pins nothing,
    // unpublished beta reads zeros (no head to gauge)
    val gauge = spark.sql(
      """SELECT domain, linked_shards, link_target_versions, linked_pinned_span
        |FROM graft_domains ORDER BY domain""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(gauge.toSeq === Seq(("alpha", 0, 0, 0L), ("beta", 0, 0, 0L)))
    // a linked upsert starts pinning: the gauge reports it (v3 carries
    // enough keys at v2 that the delta's shard leaves the other one
    // untouched — first publish BOTH shards, then upsert one key)
    val a2 = DomainStore.open(s"$root/alpha", conf)
    a2.write(kv("a" -> "2", "c" -> "1", "d" -> "1", "e" -> "1", "f" -> "1"), 3L)
    a2.upsert(spark, kv("b" -> "3"), 4L, linked = true)
    val g2 = new DomainCatalog(root, conf).toDf(spark)
      .where(col("domain") === "alpha")
      .select(col("linked_shards"), col("link_target_versions"), col("linked_pinned_span"))
      .collect()(0)
    assert(g2.getInt(0) > 0 && g2.getInt(1) === 1 && g2.getLong(2) === 1L, g2.toString)
    // a corrupt _links.json must NOT kill the status surface (that's
    // where the operator looks for the sick domain): the gauge reads the
    // -1 sentinel for that domain, the other rows stay intact, and the
    // data read path stays loud
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$root/alpha/4/${VersionedStore.LinksFileName}"), true)
    out.write("{broken".getBytes("UTF-8")); out.close()
    val g3 = new DomainCatalog(root, conf).toDf(spark)
      .select(col("domain"), col("linked_pinned_span")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g3 === Map("alpha" -> -1L, "beta" -> 0L), g3.toString)
    intercept[IllegalStateException](
      DomainStore.open(s"$root/alpha", conf).read(spark).count())
  }

  test("isFullyLoaded / isUpdating / updating mirror the reference's shared service") {
    val root = scratch("catalog-loadstate")
    val cat = new DomainCatalog(root, conf)
    assert(cat.isFullyLoaded, "empty catalog is vacuously loaded")
    assert(!cat.isUpdating)
    val a = DomainStore.create(s"$root/alpha", DomainSpec(2), conf)
    a.write(kv("a" -> "1"), 1L)
    assert(cat.isFullyLoaded && !cat.isUpdating)
    // a build in flight: the .building marker without token or failure
    a.versions.createVersion(2L)
    assert(cat.metadata("alpha").updating)
    assert(cat.metadata("alpha").inFlightVersions === Seq(2L))
    assert(cat.isUpdating)
    assert(cat.isFullyLoaded, "an updating domain still serves v1 — stays loaded")
    a.versions.succeedVersion(2L)
    assert(!cat.isUpdating)
    // a failed attempt is NOT 'updating' (its dir is reaped + marked)
    a.versions.createVersion(3L)
    a.versions.failVersion(3L)
    assert(!cat.metadata("alpha").updating)
    // a build that crashed BEFORE any output (marker, no dir) stays
    // visibly in flight — until cleanup ages it out with the version
    // retention window, like failed markers
    a.versions.createVersion(4L)
    assert(cat.metadata("alpha").updating)
    a.versions.cleanup(versionsToKeep = 1) // keeps v2 (newest published); 4 > 2 survives
    assert(cat.metadata("alpha").updating, "a marker NEWER than kept versions survives")
    a.write(kv("a" -> "5"), 5L)
    a.versions.cleanup(versionsToKeep = 1) // keeps v5 only; 4 < 5 ages out
    assert(!cat.metadata("alpha").updating, "cleanup ages out stale building markers")
    // a never-published domain blocks isFullyLoaded
    DomainStore.create(s"$root/beta", DomainSpec(2), conf)
    assert(!cat.isFullyLoaded)
    // and the DataFrame surface carries the updating flag
    val df = cat.toDf(spark)
    val row = df.where(org.apache.spark.sql.functions.col("domain") === "alpha")
      .select("updating").head()
    assert(row.getBoolean(0) === false)
  }

  test("failed builds surface in the catalog (reference failed status)") {
    val root = scratch("catalog-failed")
    val g = DomainStore.create(s"$root/gamma", DomainSpec(2), conf)
    val cat = new DomainCatalog(root, conf)

    // build attempt dies -> failVersion leaves a marker; no published
    // version, so the domain reports failed (not a silent "loading")
    g.versions.createVersion(1L)
    g.versions.failVersion(1L)
    assert(cat.metadata("gamma").status === "failed")
    assert(cat.metadata("gamma").failedVersions === Seq(1L))

    // a retry of the same version id means loading again...
    g.versions.createVersion(1L)
    assert(cat.metadata("gamma").status === "loading")
    // ...and success clears the failure trace entirely
    g.versions.succeedVersion(1L)
    assert(cat.metadata("gamma").status === "ready")
    assert(cat.metadata("gamma").failedVersions === Nil)

    // a failed UPDATE of a serving domain does not unserve it
    g.versions.createVersion(2L)
    g.versions.failVersion(2L)
    assert(cat.metadata("gamma").status === "ready")
    assert(cat.metadata("gamma").failedVersions === Seq(2L))

    // end-to-end: a write whose job crashes publishes nothing but records
    // the failure (DomainStore.write routes errors through failVersion)
    import org.apache.spark.sql.functions.{col, udf}
    val boom = udf((_: String) => sys.error("boom"): String)
    val bad = kv("a" -> "1").withColumn("value", utf8_bytes(boom(bytes_utf8(col("value")))))
    intercept[Exception](g.write(bad, 3L))
    assert(cat.metadata("gamma").failedVersions.contains(3L))
    assert(cat.metadata("gamma").status === "ready")
  }
}
