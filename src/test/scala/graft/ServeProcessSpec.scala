package graft

import java.util.concurrent.TimeUnit

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.functions._
import graft.store.{DomainStore, RemoteKvReader}

/**
 * Cross-process for real: `graft.Serve` forked as a SEPARATE JVM (no
 * Spark in the child — the daemon is Spark-free by design), queried
 * over the socket protocol from this test JVM, and hot-swapped by its
 * own updater when this JVM publishes a new version. This is the
 * reference's actual deployment shape — a serving process apart from
 * the build cluster — exercised end to end, not simulated in-process.
 */
class ServeProcessSpec extends SparkSuite {

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("a forked graft.Serve JVM serves, hot-swaps on publish, dies clean") {
    import spark.implicits._
    val conf = new Configuration()
    val dbRoot = scratch("serve-proc-db")
    def kv(pairs: Seq[(String, String)]) =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
    // the domain is SPEC'D but unpublished at fork time: the child boots
    // with an empty census and must (a) answer STATUS "loading" for it,
    // (b) sweep it in once v1 publishes — the reference's boot-then-load
    val users = DomainStore.create(
      s"$dbRoot/users", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val proc = new ProcessBuilder(
      javaBin, "-Xmx512m", "-cp", System.getProperty("java.class.path"),
      "graft.Serve", dbRoot, "0", "1")
      .redirectErrorStream(true)
      .start()
    try {
      // the daemon prints "[serve] serving ... on port N" once bound
      val lines = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      val portRe = raw".*on port (\d+).*".r
      val deadline = System.nanoTime() + 60e9.toLong
      var port = -1
      while (port < 0 && System.nanoTime() < deadline) {
        val line = lines.readLine()
        assert(line != null, "daemon exited before binding")
        line match {
          case portRe(p) => port = p.toInt
          case _ => ()
        }
      }
      assert(port > 0, "daemon never reported its port")
      // drain the child's stdout so it can't block on a full pipe
      val drainer = new Thread(() => {
        try { while (lines.readLine() != null) () }
        catch { case _: java.io.IOException => () }
      })
      drainer.setDaemon(true)
      drainer.start()

      val remote = new RemoteKvReader("127.0.0.1", port, "users")
      try {
        // LOADING over the wire: nothing published yet, but the child's
        // STATUS op answers for the spec'd domain
        assert(remote.status() === graft.store.ServedDomainStatus(
          "users", "loading", -1L, -1L, updating = false))
        assert(!remote.fullyLoaded)

        // publish v1 from THIS JVM; the child's 1 s updater loads it
        users.write(kv((0 until 50).map(i => s"u$i" -> s"name-$i")), 1L)
        val readyBy = System.nanoTime() + 30e9.toLong
        while (remote.status().status != "ready" && System.nanoTime() < readyBy)
          Thread.sleep(100)
        assert(remote.status() === graft.store.ServedDomainStatus(
          "users", "ready", 1L, 1L, updating = false))
        assert(remote.fullyLoaded)

        assert(remote.numShards === 4)
        assert(remote.servedVersion === 1L)
        assert(remote.get(utf8("u7")).map(new String(_, "UTF-8")) === Some("name-7"))
        assert(remote.multiGet(Seq(utf8("u1"), utf8("absent")))
          .map(_.map(new String(_, "UTF-8"))) === Seq(Some("name-1"), None))

        // publish v2 from THIS JVM; the child's 1 s updater must swap
        users.write(kv((0 until 50).map(i => s"u$i" -> s"v2-$i")), 2L)
        val swapBy = System.nanoTime() + 30e9.toLong
        while (remote.servedVersion < 2L && System.nanoTime() < swapBy)
          Thread.sleep(100)
        assert(remote.servedVersion === 2L, "child updater never hot-swapped")
        assert(remote.get(utf8("u7")).map(new String(_, "UTF-8")) === Some("v2-7"))

        // UPDATING over the wire: an in-flight v3 build shows in STATUS
        // while v2 keeps serving; publishing flips it back to ready
        users.versions.createVersion(3L)
        assert(remote.status() === graft.store.ServedDomainStatus(
          "users", "ready", 2L, 2L, updating = true))
        assert(remote.get(utf8("u7")).map(new String(_, "UTF-8")) === Some("v2-7"))
        users.versions.succeedVersion(3L)
        val v3By = System.nanoTime() + 30e9.toLong
        while (remote.servedVersion < 3L && System.nanoTime() < v3By)
          Thread.sleep(100)
        assert(remote.status() === graft.store.ServedDomainStatus(
          "users", "ready", 3L, 3L, updating = false))
      } finally remote.close()
    } finally {
      proc.destroy()
      assert(proc.waitFor(15, TimeUnit.SECONDS), "daemon ignored SIGTERM")
    }
  }
}
