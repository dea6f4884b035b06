package graft.store

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{DomainSpec, ShardIndex}
import graft.functions._

/**
 * Randomized chaos fuzz of the ring-wide ordered scan (VERDICT r8 task
 * 6): staggered version rolls and host kill/restarts fire DURING long
 * scans, over a corpus whose duplicate-key runs are longer than the
 * page, and every scan must land in exactly one of two states:
 *
 *  - SUCCESS: the merged stream is globally key-ordered and, per shard,
 *    is the complete, gap-free content of exactly ONE published version
 *    (mixed versions ACROSS shards are legal mid-roll — the reference
 *    served mixed versions during updates too — but inside one shard a
 *    mix, a gap, or a dropped duplicate copy is a correctness bug);
 *  - LOUD FAILURE: the version-certified resume detects that no replica
 *    can continue a shard's run at its pinned version (roll landed on
 *    every replica mid-scan, or all replicas died) and throws naming
 *    the shard — never a silently short or mixed stream.
 *
 * Slow-ish (~15 s: 24 scans racing a seeded chaos thread). Seeded: the
 * chaos schedule is deterministic per run of the suite, the interleaving
 * with scan pages is not (that nondeterminism is the point).
 */
class RingScanChaosSpec extends SparkSuite {

  test("chaos: staggered rolls + kills mid-scan never produce a torn or gappy stream") {
    import spark.implicits._
    val conf = new Configuration()
    val numShards = 6
    val versions = 1L to 4L
    val keyIds = 0 until 250

    // duplicate runs LONGER than the page (9 copies vs pageRecords = 7)
    // on every 7th key, distinct per-copy values so a dropped copy is
    // visible, values versioned so a torn shard is visible
    def copies(i: Int): Int = if (i % 7 == 0) 9 else 1
    def rows(v: Long): Seq[(String, String)] =
      keyIds.flatMap { i =>
        val k = f"fz$i%04d"
        (0 until copies(i)).map(j => k -> s"v$v-$k#$j")
      }
    val central = DomainStore.create(
      scratch("chaos-central"),
      DomainSpec(numShards, persistenceFormat = DomainSpec.KvSorted), conf)
    versions.foreach { v =>
      central.write(
        rows(v).toDF("k", "v")
          .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
        v)
    }
    // expected per (version, shard): the sorted multiset of (key, value)
    val expected: Map[(Long, Int), Seq[(String, String)]] =
      (for (v <- versions) yield rows(v).groupBy { case (k, _) =>
        ShardIndex.shardIndex(k.getBytes("UTF-8"), numShards)
      }.map { case (s, rs) => (v, s) -> rs.sorted }).flatten.toMap

    val hosts = Seq("hA", "hB", "hC")
    val ring = ShardRing.generateIndex(hosts, numShards, replication = 2)
    val roots = hosts.map(h => h -> new Path(scratch(s"chaos-$h"))).toMap
    val locals = hosts.map { h =>
      central.localizeVersionForHost(1L, roots(h), ring, h)
      h -> KvDomainReader.open(roots(h).toString, conf, Some(ring.shardSet(h)))
    }.toMap
    val ports = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    val servers = new java.util.concurrent.ConcurrentHashMap[String, KvServer]()
    hosts.foreach { h =>
      val s = new KvServer(Map("users" -> locals(h)))
      servers.put(h, s)
      ports.put(h, s.boundPort)
    }
    val stubs: Map[String, ServingReader] = hosts.map { h =>
      h -> (new RemoteKvReader("127.0.0.1", ports.get(h), "users",
        connectTimeoutMs = 500, readTimeoutMs = 5000): ServingReader)
    }.toMap
    val client = new RingClient(ring, stubs, rnd = new scala.util.Random(17))

    // ---- chaos thread: seeded schedule of rolls and kill/restarts ----
    val chaosDone = new AtomicBoolean(false)
    val chaosFailure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val pulled = scala.collection.mutable.Map(hosts.map(_ -> 1L): _*)
    val chaos = new Thread(() => {
      val rnd = new scala.util.Random(42)
      try {
        var dead: Option[String] = None
        for (_ <- 0 until 40) {
          Thread.sleep(30 + rnd.nextInt(90))
          if (dead.isEmpty && rnd.nextInt(10) < 3) {
            // kill one host (at most one down at a time: replication 2
            // keeps every shard answerable)
            val h = hosts(rnd.nextInt(hosts.length))
            servers.remove(h).close()
            dead = Some(h)
          } else if (dead.nonEmpty && rnd.nextInt(10) < 5) {
            // restart it on the SAME port (the stubs dial per call)
            val h = dead.get
            servers.put(h, new KvServer(
              Map("users" -> locals(h)), port = ports.get(h)))
            dead = None
          } else {
            // staggered roll step: ONE host pulls + swaps its next version
            val h = hosts(rnd.nextInt(hosts.length))
            val next = pulled(h) + 1
            if (next <= versions.last) {
              central.localizeVersionForHost(next, roots(h), ring, h)
              locals(h).refresh()
              pulled(h) = next
            }
          }
        }
        // settle: everyone up, everyone on the final version
        dead.foreach { h =>
          servers.put(h, new KvServer(
            Map("users" -> locals(h)), port = ports.get(h)))
        }
        hosts.foreach { h =>
          if (pulled(h) < versions.last) {
            central.localizeVersionForHost(versions.last, roots(h), ring, h)
            pulled(h) = versions.last
          }
          locals(h).refresh()
        }
      } catch {
        case t: Throwable => chaosFailure.set(t)
      } finally chaosDone.set(true)
    }, "chaos")
    chaos.setDaemon(true)

    def verify(out: Seq[(String, String)], label: String): Unit = {
      // globally key-ordered
      val ks = out.map(_._1)
      assert(ks === ks.sorted, s"$label: stream not key-ordered")
      // per shard: complete single-version content, dup copies intact
      out.groupBy { case (k, _) =>
        ShardIndex.shardIndex(k.getBytes("UTF-8"), numShards)
      }.foreach { case (s, got) =>
        val sorted = got.sorted
        val matches = versions.filter(v => expected((v, s)) == sorted)
        assert(matches.nonEmpty,
          s"$label: shard $s output (${got.size} rows) is no published " +
            s"version's content — torn, gappy, or dup-dropped " +
            s"(head: ${sorted.take(3)})")
      }
      assert(out.groupBy { case (k, _) =>
        ShardIndex.shardIndex(k.getBytes("UTF-8"), numShards)
      }.keySet === (0 until numShards).toSet, s"$label: missing whole shards")
    }

    try {
      chaos.start()
      var ok = 0
      var loud = 0
      var attempts = 0
      while (!chaosDone.get() || attempts < 8) {
        attempts += 1
        try {
          val out = client.rangeScan(pageRecords = 7)
            .map { case (k, v) => (new String(k, "UTF-8"), new String(v, "UTF-8")) }
            .toList
          verify(out, s"scan $attempts")
          ok += 1
        } catch {
          case e: IllegalStateException =>
            // the ONLY legal failures: version-certified resume or
            // all-replicas-down, both naming the shard
            val msgs = Iterator.iterate(e: Throwable)(_.getCause)
              .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
            assert(
              msgs.contains("version") || msgs.contains("replicas") ||
                msgs.contains("failed"),
              s"scan $attempts died with an unexpected failure: $msgs")
            loud += 1
        }
      }
      chaos.join(30000)
      assert(!chaos.isAlive, "chaos thread hung")
      assert(chaosFailure.get() == null,
        s"chaos thread itself failed: ${chaosFailure.get()}")
      // the settled ring must scan clean at the final version, every shard
      val fin = client.rangeScan(pageRecords = 7)
        .map { case (k, v) => (new String(k, "UTF-8"), new String(v, "UTF-8")) }
        .toList
      verify(fin, "final scan")
      (0 until numShards).foreach { s =>
        val got = fin.filter { case (k, _) =>
          ShardIndex.shardIndex(k.getBytes("UTF-8"), numShards) == s }.sorted
        assert(got === expected((versions.last, s)), s"final scan shard $s not at v${versions.last}")
      }
      assert(ok >= 1, s"no scan ever succeeded under chaos ($loud loud failures)")
      info(s"chaos outcome: $ok clean scans, $loud loud failures, $attempts attempts")
    } finally {
      client.close()
      servers.values.forEach(s => try s.close() catch { case _: Exception => () })
      locals.values.foreach(_.close())
    }
  }
}
