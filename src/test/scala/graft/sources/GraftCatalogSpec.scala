package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.DomainSpec
import graft.store.DomainStore

/** The SQL catalog surface: domains resolvable as plain SQL tables. */
class GraftCatalogSpec extends SparkSuite {

  private val conf = new Configuration()

  private def kv(pairs: (Long, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    pairs.toDF("k", "v").select(
      graft.functions.long_be(col("k")).as("key"),
      graft.functions.utf8_bytes(col("v")).as("value"))
  }

  private def registerCatalog(name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
  }

  test("SQL over a kv domain: SHOW TABLES, SELECT, pushdown, snapshot-per-query versioning") {
    val root = scratch("sqlcat")
    val a = DomainStore.create(
      s"$root/alpha", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    a.write(kv((0L until 100L).map(i => i -> s"a$i"): _*), 1L)
    val b = DomainStore.create(
      s"$root/beta", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    b.write(kv((0L until 50L).map(i => i -> s"b$i"): _*), 1L)

    registerCatalog("graft_t1", root)
    val tables = spark.sql("SHOW TABLES IN graft_t1").select("tableName")
      .collect().map(_.getString(0)).toSet
    assert(tables === Set("alpha", "beta"))

    assert(spark.sql("SELECT * FROM graft_t1.alpha").count() === 100L)
    // shard pruning rides SQL text too
    val pruned = spark.sql("SELECT key FROM graft_t1.alpha WHERE shard = 2")
    assert(pruned.queryExecution.executedPlan.toString.contains("shards=1/4"),
      pruned.queryExecution.executedPlan.toString)
    // SQL join of two same-sharded catalog tables keeps the SPJ layout
    // available (both sides resolve through the layout-reporting source)
    val joined = spark.sql(
      """SELECT count(*) AS n FROM graft_t1.alpha a JOIN graft_t1.beta b
        |ON a.shard = b.shard AND a.key = b.key""".stripMargin)
    assert(joined.collect().head.getLong(0) === 50L)

    // a new publish is visible to the NEXT query (snapshot per resolution)
    a.upsert(spark, kv(7L -> "updated"), 2L)
    val v2 = spark.sql("SELECT value FROM graft_t1.alpha")
      .select(graft.functions.bytes_utf8(col("value")).as("v"))
      .where(col("v") === "updated")
    assert(v2.count() === 1L)

    // time travel: VERSION AS OF reads the pinned published version
    val old = spark.sql("SELECT value FROM graft_t1.alpha VERSION AS OF 1")
      .select(graft.functions.bytes_utf8(col("value")).as("v"))
    assert(old.where(col("v") === "updated").count() === 0L)
    assert(old.where(col("v") === "a7").count() === 1L)
    val noV = intercept[Exception](
      spark.sql("SELECT * FROM graft_t1.alpha VERSION AS OF 99").collect())
    assert(noV.getMessage.contains("no published version 99"), noV.getMessage)
    val ts = intercept[Exception](
      spark.sql("SELECT * FROM graft_t1.alpha TIMESTAMP AS OF '2026-01-01'").collect())
    assert(ts.getMessage.contains("VERSION AS OF"), ts.getMessage)
  }

  test("SQL catalog serves a COMPRESSED (kv-sorted-z) domain transparently") {
    val root = scratch("sqlcat-z")
    val z = DomainStore.create(
      s"$root/zeta", DomainSpec(4, persistenceFormat = DomainSpec.KvSortedZ), conf)
    z.write(kv((0L until 80L).map(i => i -> (s"zz $i " * 10)): _*), 1L)
    registerCatalog("graft_tz", root)
    assert(spark.sql("SELECT * FROM graft_tz.zeta").count() === 80L)
    val pruned = spark.sql("SELECT key FROM graft_tz.zeta WHERE shard = 3")
    assert(pruned.queryExecution.executedPlan.toString.contains("shards=1/4"),
      pruned.queryExecution.executedPlan.toString)
  }

  test("read-only + fail-loud: DDL refused, missing/non-kv domains name the problem") {
    val root = scratch("sqlcat-errs")
    val pq = DomainStore.create(s"$root/pqdom", DomainSpec(2), conf)
    pq.write(kv(1L -> "x"), 1L)
    registerCatalog("graft_t2", root)

    val missing = intercept[Exception](spark.sql("SELECT * FROM graft_t2.nope").collect())
    assert(missing.getMessage.toLowerCase.contains("nope"), missing.getMessage)

    // parquet-backed domains are not SQL-servable; the error names the path
    val wrongFmt = intercept[Exception](spark.sql("SELECT * FROM graft_t2.pqdom").collect())
    assert(wrongFmt.getMessage.contains("kv-sorted"), wrongFmt.getMessage)

    val ddl = intercept[Exception](spark.sql("DROP TABLE graft_t2.pqdom"))
    assert(ddl.getMessage.contains("read-only"), ddl.getMessage)

    // nested namespaces don't exist (the catalog is flat)
    val ns = intercept[Exception](spark.sql("SHOW TABLES IN graft_t2.sub").collect())
    assert(ns.getMessage.toLowerCase.contains("sub"), ns.getMessage)
  }
}
