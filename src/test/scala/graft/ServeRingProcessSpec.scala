package graft

import java.util.concurrent.TimeUnit

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.functions._
import graft.store.{DomainStore, RemoteKvReader, RingClient, ShardRing}

/**
 * The reference's flagship deployment shape, end to end across REAL
 * processes: a RING of serving daemons (`graft.Serve`, one forked JVM
 * per host, Spark-free), each holding the shard subset its ring
 * assignment deals it, queried through [[RingClient]] scatter-gather —
 * the re-expression of the reference's multi-host thrift service
 * (`keyval/core.clj:118-134` groups keys by replica set and falls over
 * across hosts; `core_test.clj:249-284` drives the same future-facts).
 *
 * Drives the full operational story the in-process specs can't:
 *  - a staggered version roll (hosts pull + hot-swap one at a time;
 *    mid-roll the ring legally serves MIXED versions, but every single
 *    answer is from a complete published version — old or new, never a
 *    torn mix within one host's batch);
 *  - a SIGKILLed host (no shutdown hook, no FIN handshake grace):
 *    failover re-routes its shards to the surviving replicas and the
 *    ring keeps answering completely.
 */
class ServeRingProcessSpec extends SparkSuite {

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** Fork `graft.Serve <root> 0 1` and return (process, boundPort). */
  private def forkServe(root: String): (Process, Int) =
    forkServeArgs(root, root, "0", "1")

  private def forkServeArgs(label: String, args: String*): (Process, Int) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val proc = new ProcessBuilder(
      (Seq(javaBin, "-Xmx512m", "-cp", System.getProperty("java.class.path"),
        "graft.Serve") ++ args): _*)
      .redirectErrorStream(true)
      .start()
    val lines = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
    val portRe = raw".*on port (\d+).*".r
    val deadline = System.nanoTime() + 60e9.toLong
    var port = -1
    while (port < 0 && System.nanoTime() < deadline) {
      val line = lines.readLine()
      assert(line != null, s"daemon for $label exited before binding")
      line match {
        case portRe(p) => port = p.toInt
        case _ => ()
      }
    }
    assert(port > 0, s"daemon for $label never reported its port")
    // drain the child's stdout so it can't block on a full pipe
    val drainer = new Thread(() => {
      try { while (lines.readLine() != null) () }
      catch { case _: java.io.IOException => () }
    })
    drainer.setDaemon(true)
    drainer.start()
    (proc, port)
  }

  test("a forked 3-host ring: staggered roll serves mixed-but-complete versions, SIGKILL fails over") {
    import spark.implicits._
    val conf = new Configuration()
    def kv(pairs: Seq[(String, String)]) =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))

    // the build side: a central store this JVM publishes to
    val central = DomainStore.create(
      scratch("ring-proc-central") + "/users",
      DomainSpec(6, persistenceFormat = DomainSpec.KvSorted), conf)
    val keys = (0 until 300).map(i => s"rk$i")
    central.write(kv(keys.map(k => k -> s"v1-$k")), 1L)

    // the serving side: 3 hosts, replication 2 — every shard lives on
    // exactly two of them, so any ONE host can die without data loss
    val hosts = Seq("hA", "hB", "hC")
    val ring = ShardRing.generateIndex(hosts, 6, replication = 2)
    val hostRoots = hosts.map(h => h -> scratch(s"ring-proc-$h")).toMap
    def pull(host: String, version: Long): Unit =
      central.localizeVersionForHost(
        version, new Path(hostRoots(host), "users"), ring, host)
    hosts.foreach(pull(_, 1L))

    val procs = hosts.map(h => h -> forkServe(hostRoots(h))).toMap
    val stubs = procs.map { case (h, (_, port)) =>
      h -> new RemoteKvReader("127.0.0.1", port, "users")
    }
    val client = new RingClient(
      ring, stubs, rnd = new scala.util.Random(11))
    try {
      // every host serves its complete localized v1 over the wire
      assert(client.isFullyLoaded)
      assert(client.multiGet(keys.map(utf8)).map(_.map(new String(_, "UTF-8")))
        === keys.map(k => Some(s"v1-$k")))

      // ---- staggered roll: publish v2 centrally, pull host BY host ----
      val changed = keys.filter(_.hashCode % 2 == 0)
      central.upsert(spark, kv(changed.map(k => k -> s"v2-$k")), 2L)

      pull("hA", 2L)
      val hASwapBy = System.nanoTime() + 30e9.toLong
      while (stubs("hA").servedVersion < 2L && System.nanoTime() < hASwapBy)
        Thread.sleep(100)
      assert(stubs("hA").servedVersion === 2L, "hA's daemon never hot-swapped")
      assert(stubs("hB").servedVersion === 1L) // mid-roll: mixed versions

      // mid-roll answers: every key answers, and every answer is a
      // COMPLETE version's value — v2 if the chosen replica already
      // rolled, v1 if not; an unchanged key reads v1-* from either
      val midRoll = client.multiGet(keys.map(utf8)).map(_.map(new String(_, "UTF-8")))
      keys.zip(midRoll).foreach { case (k, got) =>
        val legal: Set[Option[String]] =
          if (changed.contains(k)) Set(Some(s"v1-$k"), Some(s"v2-$k"))
          else Set(Some(s"v1-$k"))
        assert(legal.contains(got), s"mid-roll answer for $k: $got")
      }

      // finish the roll; every host converges on v2
      Seq("hB", "hC").foreach(pull(_, 2L))
      val rollBy = System.nanoTime() + 30e9.toLong
      while (stubs.values.exists(_.servedVersion < 2L) && System.nanoTime() < rollBy)
        Thread.sleep(100)
      assert(stubs.values.forall(_.servedVersion == 2L), "roll never converged")
      val v2 = keys.map(k => if (changed.contains(k)) s"v2-$k" else s"v1-$k")
      assert(client.multiGet(keys.map(utf8)).map(_.map(new String(_, "UTF-8")))
        === v2.map(Some(_)))

      // ---- SIGKILL hC: replicas absorb its shards, ring stays whole ----
      procs("hC")._1.destroyForcibly()
      assert(procs("hC")._1.waitFor(15, TimeUnit.SECONDS), "SIGKILL ignored")
      // the dead host is not certifiably loaded; data keeps flowing
      assert(!client.isFullyLoaded)
      // repeat the full sweep a few times: the random replica choice must
      // route INTO the dead host sometimes (it hosts 2/3 of the shards)
      // and fail over, never dropping or corrupting an answer
      (0 until 3).foreach { round =>
        assert(client.multiGet(keys.map(utf8)).map(_.map(new String(_, "UTF-8")))
          === v2.map(Some(_)), s"post-kill sweep $round")
      }
      assert(client.get(utf8(keys.head)).map(new String(_, "UTF-8"))
        === Some(v2.head))
    } finally {
      client.close()
      procs.values.foreach { case (p, _) => p.destroy() }
      procs.values.foreach { case (p, _) =>
        assert(p.waitFor(15, TimeUnit.SECONDS), "daemon ignored SIGTERM")
      }
    }
  }

  test("a 3-host ring boots PURELY from conf files: daemons self-pull, follow publishes, fail over") {
    import spark.implicits._
    val conf = new Configuration()
    def kv(pairs: Seq[(String, String)]) =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))

    val centralRoot = scratch("ring-conf-central")
    val central = DomainStore.create(
      centralRoot + "/users",
      DomainSpec(6, persistenceFormat = DomainSpec.KvSorted), conf)
    val keys = (0 until 200).map(i => s"ck$i")
    central.write(kv(keys.map(k => k -> s"v1-$k")), 1L)

    // a second conf'd domain: a published fp-anchor index, for the
    // ring-level batched admission probe (one planted 200-char run
    // shared by corpus docs 1 and 2 — the PyClientSpec fixture shape)
    val rnd = new scala.util.Random(47)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val run200 = randText(200)
    val probeHit = randText(30) + run200 + randText(30)
    val probeClean = randText(300)
    val fpCentral = DomainStore.create(
      centralRoot + "/fpidx",
      DomainSpec(6, persistenceFormat = DomainSpec.KvSorted,
        indexType = graft.operators.Dedup.SpanIndexType), conf)
    fpCentral.write(
      graft.operators.Dedup.fpIndexKv(
        Seq(
          1L -> (randText(100) + run200 + randText(100)),
          2L -> (run200 + randText(250)),
          3L -> randText(500)).toDF("doc_id", "text"),
        "doc_id", "text"),
      1L)

    // conf files are the ONLY deployment input from here on
    val hosts = Seq("hA", "hB", "hC")
    val ports = hosts.map { _ =>
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val confDir = new java.io.File(scratch("ring-conf-files"))
    confDir.mkdirs()
    val globalPath = new java.io.File(confDir, "global.conf").getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Path.of(globalPath),
      s"""# shared ring conf (reference global-conf.clj shape)
         |hosts = ${hosts.zip(ports).map { case (h, p) => s"$h=127.0.0.1:$p" }.mkString(", ")}
         |replication = 2
         |domain.users = ${central.root}
         |domain.fpidx = ${fpCentral.root}
         |""".stripMargin)
    val localPaths = hosts.map { h =>
      val lp = new java.io.File(confDir, s"local-$h.conf").getAbsolutePath
      java.nio.file.Files.writeString(java.nio.file.Path.of(lp),
        s"""local.root = ${scratch(s"ring-conf-$h")}
           |update.interval.s = 1
           |""".stripMargin)
      h -> lp
    }.toMap

    val procs = hosts.map(h =>
      h -> forkServeArgs(s"conf:$h", "--conf", globalPath, localPaths(h), h)).toMap
    hosts.zip(ports).foreach { case (h, p) =>
      assert(procs(h)._2 === p, s"$h bound an unexpected port") }
    val stubs = hosts.zip(ports).map { case (h, p) =>
      h -> new RemoteKvReader("127.0.0.1", p, "users")
    }.toMap
    val fpStubs = hosts.zip(ports).map { case (h, p) =>
      h -> new RemoteKvReader("127.0.0.1", p, "fpidx")
    }.toMap
    try {
      // daemons pull v1 on their own (1 s interval); wait for every host
      // to serve BOTH conf'd domains, then build the client FROM THE
      // SAME CONF
      val loadBy = System.nanoTime() + 60e9.toLong
      def served(ss: Iterable[RemoteKvReader], v: Long) = ss.forall { s =>
        try s.servedVersion >= v catch { case _: Exception => false } }
      def servedAll(v: Long) = served(stubs.values, v)
      while (!(servedAll(1L) && served(fpStubs.values, 1L)) &&
        System.nanoTime() < loadBy) Thread.sleep(200)
      assert(servedAll(1L) && served(fpStubs.values, 1L),
        "ring never self-loaded v1 of both conf'd domains")
      val client = RingClient.fromConf(
        globalPath, "users", conf, rnd = new scala.util.Random(23))
      try {
        assert(client.isFullyLoaded)
        assert(client.multiGet(keys.map(utf8)).map(_.map(new String(_, "UTF-8")))
          === keys.map(k => Some(s"v1-$k")))

        // a central publish propagates with NO orchestration: every
        // daemon's pull loop localizes + hot-swaps on its own
        val changed = keys.filter(_.hashCode % 3 == 0)
        central.upsert(spark, kv(changed.map(k => k -> s"v2-$k")), 2L)
        val rollBy = System.nanoTime() + 60e9.toLong
        while (!servedAll(2L) && System.nanoTime() < rollBy) Thread.sleep(200)
        assert(servedAll(2L), "ring never converged on the self-pulled v2")
        val v2 = keys.map(k => if (changed.contains(k)) s"v2-$k" else s"v1-$k")
        assert(client.multiGet(keys.map(utf8)).map(_.map(new String(_, "UTF-8")))
          === v2.map(Some(_)))

        // SIGKILL one conf-booted host: replication 2 absorbs it
        procs("hB")._1.destroyForcibly()
        assert(procs("hB")._1.waitFor(15, TimeUnit.SECONDS), "SIGKILL ignored")
        assert(client.multiGet(keys.map(utf8)).map(_.map(new String(_, "UTF-8")))
          === v2.map(Some(_)), "post-kill sweep")
        // fromConf also survives a down host at CONSTRUCTION time
        val client2 = RingClient.fromConf(
          globalPath, "users", conf, rnd = new scala.util.Random(29))
        try assert(client2.get(utf8(keys.head)).map(new String(_, "UTF-8"))
          === Some(v2.head))
        finally client2.close()

        // the PYTHON ring client consumes the SAME conf, JVM-free:
        // md5-mod routing + the deterministic shard deal + replica
        // failover (hB is SIGKILLED right now — ~2/3 of the shards have
        // a dead replica) must return every value and the absent miss
        val pythonAvailable =
          try new ProcessBuilder("python3", "--version").start().waitFor() == 0
          catch { case _: java.io.IOException => false } // binary absent
        if (pythonAvailable) {
          val probeKeys = keys.take(20)
          val pb = new ProcessBuilder(
            (Seq("python3", "/root/repo/src/main/python/graft_ring.py",
              globalPath, "users", "multi-get") ++ probeKeys :+ "nope-key"): _*)
          pb.redirectErrorStream(true)
          val p = pb.start()
          val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
          assert(p.waitFor(60, TimeUnit.SECONDS) && p.exitValue() == 0,
            s"python ring client failed:\n$out")
          val lines = out.trim.linesIterator.toSeq
          assert(lines.size === probeKeys.size + 1, out)
          probeKeys.zip(lines).foreach { case (k, line) =>
            val expectedV = if (changed.contains(k)) s"v2-$k" else s"v1-$k"
            assert(line === s"$k\t$expectedV", out)
          }
          assert(lines.last === "nope-key\t(absent)", out)

          // ...and its ring-wide ordered SCAN: one replica per shard
          // (failover past the dead host), globally key-ordered, complete
          val ps = new ProcessBuilder(
            "python3", "/root/repo/src/main/python/graft_ring.py",
            globalPath, "users", "scan")
          ps.redirectErrorStream(true)
          val sp = ps.start()
          val sout = new String(sp.getInputStream.readAllBytes(), "UTF-8")
          assert(sp.waitFor(60, TimeUnit.SECONDS) && sp.exitValue() == 0,
            s"python ring scan failed:\n$sout")
          val expectedScan = keys.sorted.map { k =>
            val v = if (changed.contains(k)) s"v2-$k" else s"v1-$k"
            s"$k\t$v"
          }
          assert(sout.trim.linesIterator.toSeq === expectedScan, "python ring scan diverged")

          // ...and ring-level BATCHED ADMISSION (hB still dead): the
          // deduped fingerprint keys scatter per shard owner, every
          // frame certifies ONE ring-wide served version, and the
          // answers must equal the single-server ground truth (the JVM
          // OverlapReader on the complete central store) text for text
          val jvm = new graft.store.OverlapReader(
            graft.store.KvDomainReader.open(fpCentral.root.toString, conf))
          val expectedOverlap =
            try Seq(probeHit, probeClean).map(t =>
              jvm.overlapping(t) match {
                case ids if ids.nonEmpty => ids.mkString(" ")
                case _ => "(clean)"
              })
            finally jvm.close()
          assert(expectedOverlap.head != "(clean)", "hit probe found nothing")
          assert(expectedOverlap(1) === "(clean)", "clean probe hit")
          val po = new ProcessBuilder(
            "python3", "/root/repo/src/main/python/graft_ring.py",
            globalPath, "fpidx", "overlap", probeHit, probeClean)
          po.redirectErrorStream(true)
          val op = po.start()
          val oout = new String(op.getInputStream.readAllBytes(), "UTF-8")
          assert(op.waitFor(60, TimeUnit.SECONDS) && op.exitValue() == 0,
            s"python ring overlap failed:\n$oout")
          assert(oout.trim.linesIterator.toSeq === expectedOverlap,
            s"ring batched admission diverged from single-server answers:\n$oout")
        }
      } finally client.close()
    } finally {
      (stubs.values ++ fpStubs.values)
        .foreach(s => try s.close() catch { case _: Exception => () })
      procs.values.foreach { case (p, _) => p.destroy() }
      procs.values.foreach { case (p, _) =>
        assert(p.waitFor(15, TimeUnit.SECONDS), "daemon ignored SIGTERM")
      }
    }
  }
}
