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
}
