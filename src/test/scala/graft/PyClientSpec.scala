package graft

import java.util.concurrent.TimeUnit

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.functions._
import graft.store.DomainStore

/**
 * Cross-LANGUAGE proof of the serving protocol: the dependency-free
 * Python client (`src/main/python/graft_client.py`, written from the
 * protocol doc in KvServer.scala alone — the reference shipped the same
 * thing as `elephantdb-thrift/src/py/elephantdbclient.py`) drives a live
 * [[Serve]] daemon through every op from a forked CPython process. If
 * the doc were wrong or JVM-flavored (writeUTF's modified UTF-8, the
 * present-null record tag, error-frame alignment), this is where it
 * shows.
 */
class PyClientSpec extends SparkSuite {

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def run(cmd: String*): (Int, String) = {
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor(60, TimeUnit.SECONDS), s"timed out: ${cmd.mkString(" ")}\n$out")
    (proc.exitValue(), out)
  }

  test("python client: full op surface + CLI against a live daemon") {
    assume(run("python3", "--version")._1 == 0, "python3 not on PATH")
    import spark.implicits._
    val conf = new Configuration()
    val dbRoot = scratch("pyclient-db")

    val users = DomainStore.create(
      s"$dbRoot/users", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    users.write(
      Seq(
        ("u1", Some("ada")),
        ("u2", Some("grace")),
        ("emoji-😀", Some("smile")), // non-ASCII key bytes
        ("empty", Some("")),
        ("nullv", None)) // present key, NULL value
        .toDF("k", "v")
        .select(
          utf8_bytes(col("k")).as("key"),
          when(col("v").isNotNull, utf8_bytes(col("v"))).as("value")),
      1L)
    val docs = DomainStore.create(
      s"$dbRoot/docs", DomainSpec(2, persistenceFormat = DomainSpec.KvSortedZ), conf)
    docs.write(
      Seq(("d1", "first document")).toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
      1L)

    // a published fp-anchor index domain for the cross-language overlap
    // probe: one planted 200-char run shared by corpus docs 1 and 2
    val rnd = new scala.util.Random(47)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val run200 = randText(200)
    val probeHit = randText(30) + run200 + randText(30)
    val probeEmoji = "😀" + randText(9) + run200
    val probeClean = randText(300)
    val fpidx = DomainStore.create(
      s"$dbRoot/fpidx",
      DomainSpec(4, persistenceFormat = DomainSpec.KvSorted,
        indexType = graft.operators.Dedup.SpanIndexType), conf)
    fpidx.write(
      graft.operators.Dedup.fpIndexKv(
        Seq(
          1L -> (randText(100) + run200 + randText(100)),
          2L -> (run200 + randText(250)),
          3L -> randText(500)).toDF("doc_id", "text"),
        "doc_id", "text"),
      1L)

    val handle = Serve.start(dbRoot, conf, refreshMillis = 0L, log = _ => ())
    try {
      val port = handle.boundPort.toString
      val (code, out) = run(
        "python3", "/root/repo/src/test/python/graft_client_selftest.py",
        "127.0.0.1", port, probeHit, probeEmoji)
      assert(code === 0, s"selftest failed:\n$out")
      assert(out.linesIterator.toSeq.last === "SELFTEST OK", out)

      // the CLI surface (what an operator actually types)
      assert(run("python3", "/root/repo/src/main/python/graft_client.py",
        "127.0.0.1", port, "get", "users", "u1") === ((0, "ada\n")))
      assert(run("python3", "/root/repo/src/main/python/graft_client.py",
        "127.0.0.1", port, "domains") === ((0, "docs\nfpidx\nusers\n")))
      val (sc, sout) = run("python3", "/root/repo/src/main/python/graft_client.py",
        "127.0.0.1", port, "status")
      assert(sc === 0)
      assert(sout.contains("users ready served=1 latest=1 updating=False"), sout)
      assert(run("python3", "/root/repo/src/main/python/graft_client.py",
        "127.0.0.1", port, "count", "users") === ((0, "5\n")))
      assert(run("python3", "/root/repo/src/main/python/graft_client.py",
        "127.0.0.1", port, "scan", "docs") === ((0, "d1\tfirst document\n")))
      assert(run("python3", "/root/repo/src/main/python/graft_client.py",
        "127.0.0.1", port, "update-all") === ((0, "swapped=0 failed=0\n")))
      val (mc, mout) = run("python3", "/root/repo/src/main/python/graft_client.py",
        "127.0.0.1", port, "meta", "users")
      assert(mc === 0)
      assert(mout.startsWith(
        "num_shards=4 served=1 latest=1 format=kv-sorted scheme=hash-mod " +
          "indexer=none index_type=none\n"), mout)
      // 5 keys over 4 shards leave one shard empty → absent from the
      // census (present shards only, like the dashboard's table)
      assert(mout.linesIterator.count(_.startsWith("shard=")) === 3, mout)

      // the OVERLAP probe: the Python-side anchor/md5 kernel must agree
      // with the JVM OverlapReader on the SAME served domain — the
      // cross-language proof for the fp-anchor index family (incl. a
      // non-BMP probe, where a code-unit kernel would silently diverge)
      val jvm = new graft.store.OverlapReader(
        graft.store.KvDomainReader.open(s"$dbRoot/fpidx", conf))
      try {
        Seq(probeHit, probeEmoji, probeClean).foreach { text =>
          val expected = jvm.overlapping(text)
          val (oc, oout) = run("python3", "/root/repo/src/main/python/graft_client.py",
            "127.0.0.1", port, "overlap", "fpidx", text)
          assert(oc === 0, oout)
          val got =
            if (oout.trim == "(clean)") IndexedSeq.empty[Long]
            else oout.trim.split(" ").map(_.toLong).toIndexedSeq
          assert(got === expected, s"python overlap drifted on '${text.take(20)}…'")
          assert(text != probeHit || expected.nonEmpty, "hit probe found nothing")
          assert(text != probeClean || expected.isEmpty, "clean probe hit")
        }
      } finally jvm.close()

      // the Python gate refuses a wrong-family domain loud (never a
      // silent '(clean)' admission) ...
      val (wc, wout) = run("python3", "/root/repo/src/main/python/graft_client.py",
        "127.0.0.1", port, "overlap", "users", probeHit)
      assert(wc !== 0, s"wrong-family overlap must fail: $wout")
      assert(wout.contains("not 'fp-anchor'"), wout)
      // ... and the CLI's geometry args reach the kernel: a non-matching
      // minLen yields fingerprints that can't hit the default-built index
      assert(run("python3", "/root/repo/src/main/python/graft_client.py",
        "127.0.0.1", port, "overlap", "fpidx", probeHit, "128", "8", "16")
        === ((0, "(clean)\n")))
    } finally handle.close()
  }
}
