package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.functions._
import graft.queries.Fixtures
import graft.store.DomainStore

/** Dev smoke: drives the driver's t1 surface (SparkEntry.entry) plus a few
  * behaviors the contract queries can't show (sparse upsert copy-forward,
  * publish-token visibility, single-key get). Exits non-zero on failure. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failures = 0
    def check(name: String)(cond: => Boolean): Unit = {
      val ok = try cond catch { case e: Throwable => println(s"[smoke] $name EXCEPTION: $e"); false }
      println(s"[smoke] $name: ${if (ok) "OK" else "FAIL"}")
      if (!ok) failures += 1
    }

    check("fixture schemas match expectations (drift guard)") {
      graft.queries.SchemaGuard.check(spark, "/root/testdata/sf0.001"); true
    }

    check("entry rows > 0")(SparkEntry.entry(spark).count() > 0)

    // Sparse upsert: 1 new key -> exactly 1 shard rewritten, 7 copy-forwarded.
    val root = Fixtures.scratch("/root/testdata/sf0.001", "smoke-sparse")
    val conf = Fixtures.conf
    new Path(root).getFileSystem(conf).delete(new Path(root), true)
    val store = DomainStore.create(root, DomainSpec(numShards = 8), conf)
    store.write(Fixtures.customerKv(spark, "/root/testdata/sf0.001"), version = 1L)
    val delta = spark.range(1)
      .select(long_be(lit(1L)).as("key"), utf8_bytes(lit("UPDATED")).as("value"))
    store.upsert(spark, delta, newVersion = 2L)
    val fs = new Path(root).getFileSystem(conf)
    val copied = (0 until 8).count { s =>
      val a = fs.listStatus(new Path(s"$root/1/shard=$s")).map(_.getPath.getName).toSet
      val b = fs.listStatus(new Path(s"$root/2/shard=$s")).map(_.getPath.getName).toSet
      a == b
    }
    check("sparse upsert copy-forwards 7 of 8 shards")(copied == 7)
    check("sparse upsert updated value")(
      store.get(spark, java.nio.ByteBuffer.allocate(8).putLong(1L).array())
        .exists(new String(_, "UTF-8") == "UPDATED"))
    check("count unchanged after upsert")(store.count(spark) ==
      Fixtures.table(spark, "/root/testdata/sf0.001", "customer").count())

    // Streaming twin drains to the same result as the batch operator.
    check("streaming windowAgg == batch") {
      val dir = "/root/repo/target/graft-scratch/smoke-stream"
      val p = new Path(dir)
      val fsS = p.getFileSystem(conf)
      fsS.delete(p, true); fsS.mkdirs(p)
      org.apache.hadoop.fs.FileUtil.copy(
        fsS, new Path("/root/testdata/sf0.001/events.parquet"),
        fsS, new Path(s"$dir/events-0.parquet"), false, conf)
      val batch = graft.operators.Events
        .windowAgg(Fixtures.table(spark, "/root/testdata/sf0.001", "events"), 5)
        .collect().map(_.toString).toSet
      val q = graft.streaming.StreamingEvents.windowAggToMemory(spark, dir, 5, "smoke_stream")
      try {
        q.processAllAvailable()
        spark.table("smoke_stream").collect().map(_.toString).toSet == batch && batch.nonEmpty
      } finally q.stop()
    }

    // Publish-token visibility: an unpublished version is invisible.
    check("unpublished version invisible") {
      store.versions.createVersion(3L)
      val latest = store.latestVersion
      store.versions.failVersion(3L)
      latest == 2L
    }
    // ...and the failure it left is catalog-visible (reference failed
    // status) without unserving the domain.
    check("failed version leaves a visible marker, domain stays ready") {
      store.versions.failedVersions.contains(3L) && {
        val cat = new graft.store.DomainCatalog(
          Fixtures.dbRoot("/root/testdata/sf0.001"), conf)
        cat.metadata("smoke-sparse").status == "ready" &&
          cat.metadata("smoke-sparse").failedVersions.contains(3L)
      }
    }

    // In-memory persistence (S11): whole pipeline, zero disk.
    check("memory-format domain round-trips on ramfs") {
      graft.store.RamFileSystem.clear("smoke")
      val mem = DomainStore.create(
        "ramfs://smoke/dom",
        DomainSpec(numShards = 4, persistenceFormat = DomainSpec.Memory),
        Fixtures.conf)
      mem.write(Fixtures.customerKv(spark, "/root/testdata/sf0.001"), version = 1L)
      mem.count(spark) ==
        Fixtures.table(spark, "/root/testdata/sf0.001", "customer").count()
    }

    // Serving engine: kv-sorted build -> Spark-free binary-search get.
    check("kv-sorted domain serves gets without Spark") {
      val kvRoot = Fixtures.scratch("/root/testdata/sf0.001", "smoke-kvserve")
      new Path(kvRoot).getFileSystem(conf).delete(new Path(kvRoot), true)
      val served = DomainStore.create(
        kvRoot, DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted), conf)
      served.write(Fixtures.customerKv(spark, "/root/testdata/sf0.001"), version = 1L)
      val reader = graft.store.KvDomainReader.open(kvRoot, conf)
      try {
        val hit = reader.get(java.nio.ByteBuffer.allocate(8).putLong(1L).array())
        hit.exists(_.nonEmpty) &&
          reader.get("no-such-key".getBytes("UTF-8")).isEmpty &&
          reader.count() ==
            Fixtures.table(spark, "/root/testdata/sf0.001", "customer").count()
      } finally reader.close()
    }

    // Salt is a query-time rewrite only: same result as the plain join.
    check("salted lookupJoin == plain lookupJoin") {
      val probe = Fixtures.table(spark, "/root/testdata/sf0.001", "orders")
        .select(col("o_orderkey"), long_be(col("o_custkey") % 50).as("key"))
      def m(df: org.apache.spark.sql.DataFrame) = df
        .select(col("o_orderkey"), bytes_utf8(col("value")))
        .collect().map(_.toString).sorted.toSeq
      m(store.lookupJoin(probe, salt = 4)) == m(store.lookupJoin(probe))
    }
    // Stateful streaming sessionization drains to the batch result.
    check("stateful streaming sessions == batch") {
      val dir = "/root/repo/target/graft-scratch/smoke-stream" // staged above
      val batch = graft.operators.Events
        .sessionStats(Fixtures.table(spark, "/root/testdata/sf0.001", "events"), 30)
        .collect().map(_.toString).toSet
      val q = graft.streaming.StreamingEvents.sessionStatsToMemory(spark, dir, 30, "smoke_sessions")
      try {
        q.processAllAvailable()
        graft.streaming.StreamingEvents.latestSessionStats(spark, "smoke_sessions")
          .collect().map(_.toString).toSet == batch && batch.nonEmpty
      } finally q.stop()
    }

    // Catalog surface: the scratch root is a database of domains.
    check("catalog lists domains with ready status") {
      val cat = new graft.store.DomainCatalog(
        Fixtures.dbRoot("/root/testdata/sf0.001"), conf)
      val names = cat.listDomains
      names.contains("smoke-sparse") &&
        cat.metadata("smoke-sparse").status == "ready" &&
        cat.metadata("smoke-sparse").latestVersion.contains(2L)
    }

    // Duplicate publish rejected.
    check("duplicate version rejected")(
      try { store.versions.createVersion(2L); false }
      catch { case _: IllegalArgumentException => true })

    // One-call ops dashboard over the same database root: every fixture
    // domain gets a row with shard totals; the smoke-sparse domain's
    // stats must reflect its real size.
    check("Status.report: one row per domain with shard totals") {
      val df = Status.report(spark, Fixtures.dbRoot("/root/testdata/sf0.001"), conf)
      val rows = df.collect().map(r => r.getString(0) -> r).toMap
      rows.contains("smoke-sparse") && {
        val r = rows("smoke-sparse")
        r.getString(1) == "ready" &&
          r.getLong(df.columns.indexOf("n_rows")) == store.count(spark) &&
          r.getLong(df.columns.indexOf("n_bytes")) > 0
      }
    }

    spark.stop()
    if (failures > 0) { println(s"[smoke] $failures FAILURES"); sys.exit(1) }
    println("[smoke] all OK")
  }
}
