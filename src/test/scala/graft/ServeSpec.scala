package graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.functions._
import graft.store.{DomainStore, RemoteKvReader}

/**
 * The standalone daemon ([[Serve]]): serves every servable domain under
 * a catalog root over the socket protocol, skips Spark-scan-engine
 * domains with a notice, and its updater loop hot-swaps to new
 * publishes without a restart — the reference's deployable server
 * process end to end.
 */
class ServeSpec extends SparkSuite {

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("daemon serves the catalog's kv domains and follows new publishes") {
    import spark.implicits._
    val conf = new Configuration()
    val dbRoot = scratch("serve-db")
    def kv(pairs: Seq[(String, String)]) =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))

    val users = DomainStore.create(
      s"$dbRoot/users", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    users.write(kv(Seq("u1" -> "ada", "u2" -> "grace")), 1L)
    val docs = DomainStore.create(
      s"$dbRoot/docs", DomainSpec(2, persistenceFormat = DomainSpec.KvSortedZ), conf)
    docs.write(kv(Seq("d1" -> "some document text")), 1L)
    // a parquet domain is a Spark scan engine: skipped with a notice
    val plain = DomainStore.create(s"$dbRoot/plain", DomainSpec(2), conf)
    plain.write(kv(Seq("p" -> "x")), 1L)

    val notices = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val handle = Serve.start(dbRoot, conf, refreshMillis = 100L, log = notices.add(_))
    try {
      assert(handle.readers.keySet === Set("users", "docs"))
      assert(notices.asScala().exists(n => n.contains("skip plain")), notices)

      val remoteUsers = new RemoteKvReader("127.0.0.1", handle.boundPort, "users")
      val remoteDocs = new RemoteKvReader("127.0.0.1", handle.boundPort, "docs")
      try {
        assert(remoteUsers.get(utf8("u1")).map(new String(_, "UTF-8")) === Some("ada"))
        assert(remoteDocs.get(utf8("d1")).map(new String(_, "UTF-8")) ===
          Some("some document text"))
        assert(remoteUsers.domainNames() === Seq("docs", "users"))

        // publish v2: the UPDATER (not the client) must swap it in
        users.write(kv(Seq("u1" -> "ada lovelace", "u2" -> "grace")), 2L)
        val deadline = System.nanoTime() + 15e9.toLong
        while (remoteUsers.servedVersion < 2L && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(remoteUsers.servedVersion === 2L, "updater never swapped to v2")
        assert(remoteUsers.get(utf8("u1")).map(new String(_, "UTF-8")) ===
          Some("ada lovelace"))
        // the untouched domain kept serving throughout
        assert(remoteDocs.servedVersion === 1L)

        // a domain whose FIRST publish lands after boot is discovered by
        // the updater's catalog sweep (the reference's initial loads) —
        // no restart needed
        val late = DomainStore.create(
          s"$dbRoot/late", DomainSpec(2, persistenceFormat = DomainSpec.KvSorted), conf)
        late.write(kv(Seq("l1" -> "late arrival")), 1L)
        val lateDeadline = System.nanoTime() + 15e9.toLong
        while (!handle.readers.contains("late") && System.nanoTime() < lateDeadline)
          Thread.sleep(50)
        assert(handle.readers.contains("late"), "updater never loaded the late domain")
        val remoteLate = new RemoteKvReader("127.0.0.1", handle.boundPort, "late")
        try {
          assert(remoteLate.get(utf8("l1")).map(new String(_, "UTF-8")) ===
            Some("late arrival"))
          assert(remoteLate.domainNames() === Seq("docs", "late", "users"))
        } finally remoteLate.close()
      } finally {
        remoteUsers.close(); remoteDocs.close()
      }
    } finally handle.close()
  }

  private def awaitUntil(what: String, timeoutNanos: Long = 15e9.toLong)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutNanos
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cond, s"timed out waiting for: $what")
  }

  test("STATUS lifecycle over the wire: loading -> ready -> updating -> ready; failed is loud") {
    import spark.implicits._
    import graft.store.ServedDomainStatus
    val conf = new Configuration()
    val dbRoot = scratch("serve-status-db")
    def kv(pairs: Seq[(String, String)]) =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))

    // a spec'd domain with NOTHING published yet, plus a parquet domain
    // (a Spark scan engine — never part of the serving census)
    val users = DomainStore.create(
      s"$dbRoot/users", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    val plain = DomainStore.create(s"$dbRoot/plain", DomainSpec(2), conf)
    plain.write(kv(Seq("p" -> "x")), 1L)

    val handle = Serve.start(dbRoot, conf, refreshMillis = 100L, log = _ => ())
    val remote = new RemoteKvReader("127.0.0.1", handle.boundPort, "users")
    try {
      // LOADING: STATUS answers for a domain nothing serves yet — the
      // one state a data op could never report
      assert(remote.status() ===
        ServedDomainStatus("users", "loading", -1L, -1L, updating = false))
      assert(remote.statusAll().map(_.name) === Seq("users"))
      assert(!remote.fullyLoaded)

      // READY: first publish; the updater sweeps it in
      users.write(kv((0 until 40).map(i => s"u$i" -> s"v1-$i")), 1L)
      awaitUntil("users to sweep in")(remote.status().status == "ready")
      assert(remote.status() ===
        ServedDomainStatus("users", "ready", 1L, 1L, updating = false))
      assert(remote.fullyLoaded)

      // UPDATING: an in-flight build (.building marker) shows over the
      // wire while the old version keeps serving
      users.versions.createVersion(2L)
      assert(remote.status() ===
        ServedDomainStatus("users", "ready", 1L, 1L, updating = true))
      assert(remote.get(utf8("u3")).map(new String(_, "UTF-8")) === Some("v1-3"))

      // back to READY at the new version once it publishes (an empty
      // published version is legal — every key reads absent)
      users.versions.succeedVersion(2L)
      awaitUntil("v2 hot-swap")(remote.servedVersion == 2L)
      assert(remote.status() ===
        ServedDomainStatus("users", "ready", 2L, 2L, updating = false))
      assert(remote.get(utf8("u3")) === None)

      // FAILED: a domain whose only build attempt failed — visible in
      // the census immediately, and it pins fullyLoaded false
      val bad = DomainStore.create(
        s"$dbRoot/bad", DomainSpec(2, persistenceFormat = DomainSpec.KvSorted), conf)
      bad.versions.createVersion(1L)
      bad.versions.failVersion(1L)
      assert(remote.statusAll().find(_.name == "bad") ===
        Some(ServedDomainStatus("bad", "failed", -1L, -1L, updating = false)))
      assert(!remote.fullyLoaded)
    } finally {
      remote.close(); handle.close()
    }
  }

  test("remote updateAll: on-demand sweep + refresh with polling disabled") {
    import spark.implicits._
    val conf = new Configuration()
    val dbRoot = scratch("serve-updateall-db")
    def kv(pairs: Seq[(String, String)]) =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
    val users = DomainStore.create(
      s"$dbRoot/users", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    users.write(kv(Seq("u1" -> "v1")), 1L)

    // no updater thread at all: the ONLY way anything moves is the
    // remote UPDATE_ALL op — proving it sweeps AND refreshes by itself
    val handle = Serve.start(dbRoot, conf, refreshMillis = 0L, log = _ => ())
    val remote = new RemoteKvReader("127.0.0.1", handle.boundPort, "users")
    try {
      assert(remote.servedVersion === 1L)
      users.write(kv(Seq("u1" -> "v2")), 2L)
      val late = DomainStore.create(
        s"$dbRoot/late", DomainSpec(2, persistenceFormat = DomainSpec.KvSorted), conf)
      late.write(kv(Seq("l1" -> "late")), 1L)

      assert(remote.updateAll() === ((1, 0))) // users swapped; late newly loaded
      assert(remote.servedVersion === 2L)
      assert(remote.get(utf8("u1")).map(new String(_, "UTF-8")) === Some("v2"))
      val remoteLate = new RemoteKvReader("127.0.0.1", handle.boundPort, "late")
      try {
        assert(remoteLate.get(utf8("l1")).map(new String(_, "UTF-8")) === Some("late"))
        assert(remote.fullyLoaded)
      } finally remoteLate.close()
    } finally {
      remote.close(); handle.close()
    }
  }

  test("cleanupKeep: the updater reaps old local versions after each hot-swap") {
    import spark.implicits._
    val conf = new Configuration()
    val dbRoot = scratch("serve-cleanup-db")
    def kv(pairs: Seq[(String, String)]) =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
    val users = DomainStore.create(
      s"$dbRoot/users", DomainSpec(2, persistenceFormat = DomainSpec.KvSorted), conf)
    users.write(kv(Seq("k" -> "v1")), 1L)

    val handle = Serve.start(
      dbRoot, conf, refreshMillis = 100L, log = _ => (), cleanupKeep = 2)
    val remote = new RemoteKvReader("127.0.0.1", handle.boundPort, "users")
    try {
      awaitUntil("v1 served")(remote.servedVersion === 1L)
      users.write(kv(Seq("k" -> "v2")), 2L)
      awaitUntil("v2 swap")(remote.servedVersion === 2L)
      users.write(kv(Seq("k" -> "v3")), 3L)
      awaitUntil("v3 swap")(remote.servedVersion === 3L)
      // keep-2 horizon: v1 reaped, v2 + v3 on disk, serving unharmed
      awaitUntil("v1 reaped")(users.versions.getAllVersions === Seq(3L, 2L))
      assert(remote.get("k".getBytes("UTF-8")).map(new String(_, "UTF-8")) === Some("v3"))
      // and the reap is one-shot per advance, not per sweep: the token
      // set stays stable across further polls with no new publish
      Thread.sleep(400)
      assert(users.versions.getAllVersions === Seq(3L, 2L))
    } finally {
      remote.close(); handle.close()
    }
  }

  test("linked publish chain: daemon hot-swaps onto linked versions; GC keeps origins") {
    import spark.implicits._
    val conf = new Configuration()
    val dbRoot = scratch("serve-linked-db")
    def kv(pairs: Seq[(String, String)]) =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
    val users = DomainStore.create(
      s"$dbRoot/users", DomainSpec(8, persistenceFormat = DomainSpec.KvSorted), conf)
    val base = (0 until 200).map(i => s"lk$i" -> s"v$i")
    users.write(kv(base), 1L)

    // tightest legal GC (keep-2) — v1 survives the window ONLY because
    // the in-daemon reaper's keep set expands over the kept versions' links
    val handle = Serve.start(
      dbRoot, conf, refreshMillis = 100L, log = _ => (), cleanupKeep = 2)
    val remote = new RemoteKvReader("127.0.0.1", handle.boundPort, "users")
    try {
      awaitUntil("v1 served")(remote.servedVersion === 1L)
      users.upsert(spark, kv(Seq("lk0" -> "NEW")), 2L, linked = true)
      awaitUntil("v2 swap")(remote.servedVersion === 2L)
      users.upsert(spark, kv(Seq("lk1" -> "ALSO")), 3L, linked = true)
      awaitUntil("v3 swap")(remote.servedVersion === 3L)
      // keep-2 window is {3, 2}, but both link into v1: all three survive
      Thread.sleep(400) // let a few reap sweeps run
      assert(users.versions.getAllVersions === Seq(3L, 2L, 1L))
      // served answers come from linked shards after the sweeps
      assert(remote.get(utf8("lk0")).map(new String(_, "UTF-8")) === Some("NEW"))
      assert(remote.get(utf8("lk1")).map(new String(_, "UTF-8")) === Some("ALSO"))
      assert(remote.get(utf8("lk7")).map(new String(_, "UTF-8")) === Some("v7"))
      assert(remote.count() === base.size.toLong)
      // self-contained publishes release the chain on the next sweeps
      users.write(kv(base.map { case (k, _) => k -> "r4" }), 4L)
      awaitUntil("v4 swap")(remote.servedVersion === 4L)
      users.write(kv(base.map { case (k, _) => k -> "r5" }), 5L)
      awaitUntil("v5 swap")(remote.servedVersion === 5L)
      awaitUntil("chain reaped")(users.versions.getAllVersions === Seq(5L, 4L))
      assert(remote.get(utf8("lk7")).map(new String(_, "UTF-8")) === Some("r5"))
    } finally {
      remote.close(); handle.close()
    }
  }

  private implicit class QueueOps(q: java.util.concurrent.ConcurrentLinkedQueue[String]) {
    def asScala(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala.toSeq
    }
  }
}
