package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{DomainSpec, ShardIndex}
import graft.functions._

/** The client half of multi-process serving: ring routing + replica
  * failover over localized readers (reference keyval client semantics —
  * answers end the search, failures fall over, hosts-down throws). */
class RingClientSpec extends SparkSuite {

  private val conf = new Configuration()
  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private val n = 5
  private val hosts = Seq("hA", "hB", "hC")
  private lazy val (store, ring) = {
    import spark.implicits._
    val store = DomainStore.create(
      scratch("ringcli-domain"),
      DomainSpec(n, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(
      (0 until 500).map(i => s"ck$i" -> s"cv$i").toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
      1L)
    (store, ShardRing.generateIndex(hosts, n, replication = 2))
  }

  private def openReaders(): Map[String, KvDomainReader] =
    hosts.map { h =>
      val dest = new Path(scratch(s"ringcli-$h"))
      store.localizeForHost(1L, dest, ring, h)
      // declare the hosted set so a misrouted probe throws (wrong-host)
      // instead of reading as absent — the client treats it as failover
      h -> KvDomainReader.localized(
        dest.toString, store.spec, conf, Some(ring.shardSet(h)))
    }.toMap

  test("get and multiGet answer every key and miss through the ring") {
    val client = new RingClient(ring, openReaders(), rnd = new scala.util.Random(1))
    try {
      (0 until 500).foreach { i =>
        assert(client.get(utf8(s"ck$i")).map(new String(_, "UTF-8")) === Some(s"cv$i"))
      }
      assert(client.get(utf8("absent")) === None)
      // a DIRECT probe of a reader for a shard it does not host is loud
      // (the reference's WrongHostException), never a silent 'absent'
      val someHost = hosts.find(h => ring.shardSet(h).size < n).get
      val foreign = (0 until n).find(s => !ring.shardSet(someHost).contains(s)).get
      val fk = (0 until 10000).map(i => s"ck$i")
        .find(k => ShardIndex.shardIndex(utf8(k), n) == foreign).get
      val readers2 = openReaders()
      try {
        val e = intercept[IllegalStateException](readers2(someHost).get(utf8(fk)))
        assert(e.getMessage.contains("wrong host"), e.getMessage)
      } finally readers2.values.foreach(_.close())
      val keys = Seq("ck3", "nope", "ck499", "ck3") // misses + duplicate inputs
      val got = client.multiGet(keys.map(utf8)).map(_.map(new String(_, "UTF-8")))
      assert(got === IndexedSeq(Some("cv3"), None, Some("cv499"), Some("cv3")))
    } finally client.close()
  }

  test("one dead replica is invisible; a fully-dead shard fails naming its replica set") {
    val readers = openReaders()
    // kill hA: every shard it held still has a second replica
    readers("hA").close()
    val client = new RingClient(ring, readers, rnd = new scala.util.Random(7))
    (0 until 500).foreach { i =>
      assert(client.get(utf8(s"ck$i")).map(new String(_, "UTF-8")) === Some(s"cv$i"),
        s"key ck$i must fail over to the live replica")
    }
    val keysAll = (0 until 500).map(i => utf8(s"ck$i"))
    val got = client.multiGet(keysAll).map(_.map(new String(_, "UTF-8")))
    (0 until 500).foreach(i => assert(got(i) === Some(s"cv$i")))
    // now kill hB too: some shard's full replica set {hA,hB} is down
    readers("hB").close()
    val deadShard = (0 until n).find(s => ring.hostSet(s) == Set("hA", "hB"))
    assume(deadShard.isDefined, "ring layout must contain an {hA,hB} shard")
    val deadKey = (0 until 10000).map(i => s"ck$i")
      .find(k => ShardIndex.shardIndex(utf8(k), n) == deadShard.get).get
    val e = intercept[IllegalStateException](client.get(utf8(deadKey)))
    assert(e.getMessage.contains(s"shard ${deadShard.get}"), e.getMessage)
    assert(e.getMessage.contains("hA") && e.getMessage.contains("hB"), e.getMessage)
    val e2 = intercept[IllegalStateException](client.multiGet(Seq(utf8(deadKey))))
    assert(e2.getMessage.contains("all replicas"), e2.getMessage)
    // keys on shards with a surviving replica (hC) still answer EXACTLY
    val liveKeys = (0 until 500).map(i => s"ck$i")
      .filter(k => ring.hostSet(ShardIndex.shardIndex(utf8(k), n)).contains("hC"))
    assert(liveKeys.nonEmpty)
    liveKeys.foreach { k =>
      assert(client.get(utf8(k)).map(new String(_, "UTF-8")) === Some("cv" + k.drop(2)),
        s"key $k must still answer through hC")
    }
    readers("hC").close()
  }

  test("construction rejects mismatched rings and missing readers") {
    val readers = openReaders()
    try {
      // a ring mentioning a host with no reader
      val badRing = ShardRing.generateIndex(hosts :+ "ghost", n, replication = 2)
      val e = intercept[IllegalArgumentException](new RingClient(badRing, readers))
      assert(e.getMessage.contains("ghost"), e.getMessage)
      // a ring built for FEWER shards than the domain: a routed shard has
      // no ring entry — loud, naming the mismatch
      val small = ShardRing.generateIndex(hosts, 2, replication = 2)
      val cli2 = new RingClient(small, readers)
      val k = (0 until 1000).map(i => s"ck$i")
        .find(k => ShardIndex.shardIndex(utf8(k), n) >= 2).get
      val e2 = intercept[IllegalStateException](cli2.get(utf8(k)))
      assert(e2.getMessage.contains("different shard count"), e2.getMessage)
    } finally readers.values.foreach(_.close())
  }

  test("refreshAll: localized subsets report false; a CLOSED reader fails loud") {
    // bare localized subsets cannot refresh — benign, reported false
    val readers = openReaders()
    val client = new RingClient(ring, readers)
    try {
      assert(readers.values.forall(!_.canRefresh))
      assert(client.refreshAll() === hosts.map(_ -> false).toMap)
    } finally client.close()
    // but a broken host (closed reader) must NOT read as 'already
    // newest' — mapping it to false would hide a permanently stuck host
    val vroot = scratch("ringcli-refresh-closed")
    val vstore = DomainStore.create(
      vroot, DomainSpec(n, persistenceFormat = DomainSpec.KvSorted), conf)
    import spark.implicits._
    vstore.write(
      Seq("a" -> "1").toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
      1L)
    val ring1 = ShardRing.generateIndex(Seq("hA"), n, replication = 1)
    val r = KvDomainReader.open(vroot, conf)
    val solo = new RingClient(ring1, Map("hA" -> r))
    r.close()
    assert(intercept[IllegalStateException](solo.refreshAll())
      .getMessage.contains("closed"))
  }

  test("fromConf gates custom-scheme domains AT BOOT, naming the scheme; hash-mod untouched") {
    import spark.implicits._
    val schemeName = classOf[FirstByteModScheme].getName
    def kv(prefix: String) = (0 until 50).map(i => s"$prefix$i" -> s"v$i").toDF("k", "v")
      .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
    val pqRoot = scratch("ringconf-pq")
    val pq = DomainStore.create(
      pqRoot,
      DomainSpec(4, shardScheme = schemeName, persistenceFormat = DomainSpec.KvSorted),
      conf)
    pq.write(kv("p"), 1L)
    val hmRoot = scratch("ringconf-hm")
    val hm = DomainStore.create(
      hmRoot, DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    hm.write(kv("h"), 1L)
    val rdPq = KvDomainReader.open(pqRoot, conf)
    val rdHm = KvDomainReader.open(hmRoot, conf)
    val server = new KvServer(Map("pq" -> rdPq, "hm" -> rdHm))
    try {
      val confDir = new java.io.File(scratch("ringconf-files"))
      confDir.mkdirs()
      val globalPath = new java.io.File(confDir, "global.conf").getAbsolutePath
      java.nio.file.Files.writeString(java.nio.file.Path.of(globalPath),
        s"""hosts = hA=127.0.0.1:${server.boundPort}
           |replication = 1
           |domain.pq = $pqRoot
           |domain.hm = $hmRoot
           |""".stripMargin)
      // the custom-scheme domain fails AT CONSTRUCTION, scheme named —
      // never the old degrade-to-per-lookup-wrong-host-failover
      val e = intercept[IllegalArgumentException](
        RingClient.fromConf(globalPath, "pq", conf))
      assert(e.getMessage.contains(schemeName), e.getMessage)
      assert(e.getMessage.contains("hash-mod"), e.getMessage)
      // the hash-mod domain on the SAME server boots and serves
      val ok = RingClient.fromConf(globalPath, "hm", conf)
      try assert(ok.get(utf8("h3")).map(new String(_, "UTF-8")) === Some("v3"))
      finally ok.close()
      // the PYTHON ring client gates identically from the same conf
      val pythonAvailable =
        try new ProcessBuilder("python3", "--version").start().waitFor() == 0
        catch { case _: java.io.IOException => false }
      if (pythonAvailable) {
        val pb = new ProcessBuilder(
          "python3", "/root/repo/src/main/python/graft_ring.py",
          globalPath, "pq", "get", "p3")
        pb.redirectErrorStream(true)
        val p = pb.start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS) && p.exitValue() != 0,
          s"python ring client must refuse a custom-scheme domain:\n$out")
        assert(out.contains(schemeName) && out.contains("hash-mod"), out)
        val pb2 = new ProcessBuilder(
          "python3", "/root/repo/src/main/python/graft_ring.py",
          globalPath, "hm", "get", "h3")
        pb2.redirectErrorStream(true)
        val p2 = pb2.start()
        val out2 = new String(p2.getInputStream.readAllBytes(), "UTF-8")
        assert(p2.waitFor(30, java.util.concurrent.TimeUnit.SECONDS) && p2.exitValue() == 0, out2)
        assert(out2.trim === "v3", out2)
      }
    } finally {
      server.close()
      rdPq.close()
      rdHm.close()
    }
  }
}
