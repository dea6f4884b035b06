package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{DomainSpec, ShardIndex}
import graft.functions._

/** Pins [[ShardRing]] to the REFERENCE's exact assignment vectors
  * (`elephantdb-server/test/elephantdb/common/shard_test.clj:5-41`) and
  * proves the multi-host serving round-trip: N localized readers driven
  * by one ring answer every key, replicated keys on exactly r hosts. */
class ShardRingSpec extends SparkSuite {

  private val conf = new Configuration()

  test("computeHostToShards replays the reference's round-robin deal exactly") {
    // shard_test.clj:8-9
    assert(ShardRing.computeHostToShards(Seq("a", "b"), 5, 1) ===
      Map("a" -> Set(0, 2, 4), "b" -> Set(1, 3)))
    // shard_test.clj:10-13
    assert(ShardRing.computeHostToShards(Seq("a", "b", "c"), 5, 2) ===
      Map("a" -> Set(0, 1, 3, 4), "b" -> Set(1, 2, 4), "c" -> Set(0, 2, 3)))
    // shard_test.clj:15-16 — replication past the host count must throw
    intercept[IllegalArgumentException](ShardRing.computeHostToShards(Seq("a", "b"), 3, 3))
  }

  test("generateIndex: shard-set and host-set match the reference vectors") {
    val index = ShardRing.generateIndex(Seq("a", "b", "c"), 5, 2)
    // shard_test.clj:19-24
    assert(index.shardSet("a") === Set(0, 1, 3, 4))
    assert(index.shardSet("b") === Set(1, 2, 4))
    assert(index.shardSet("c") === Set(0, 2, 3))
    // shard_test.clj:25-29
    assert(index.hostSet(0) === Set("a", "c"))
    assert(index.hostSet(1) === Set("a", "b"))
    assert(index.hostSet(2) === Set("b", "c"))
    assert(index.hostSet(3) === Set("a", "c"))
    assert(index.hostSet(4) === Set("a", "b"))
    // unknown host / shard read as empty, never throw (absent-key maps)
    assert(index.shardSet("nope") === Set.empty[Int])
    assert(index.hostSet(99) === Set.empty[String])
  }

  test("replication invariants hold across (hosts, shards, r) combinations") {
    for {
      nHosts <- Seq(1, 2, 3, 5, 8)
      shards <- Seq(1, 4, 16, 33)
      r <- 1 to nHosts
    } {
      val hosts = (0 until nHosts).map(i => s"h$i")
      val m = ShardRing.computeHostToShards(hosts, shards, r)
      val counts = (0 until shards).map(s => m.valuesIterator.count(_.contains(s)))
      assert(counts.forall(_ == r), s"hosts=$nHosts shards=$shards r=$r: $counts")
      // round-robin balance: host loads differ by at most 1 deal slot per pass
      val loads = hosts.map(h => m.getOrElse(h, Set.empty).size)
      assert(loads.max - loads.min <= r,
        s"hosts=$nHosts shards=$shards r=$r loads=$loads")
    }
  }

  test("prioritizeHosts puts the preferred host first (reference tabular fact)") {
    // shard_test.clj:32-41: index over 5 hosts, 10 shards, replication 5 —
    // every host holds shard 5, and the predicate host must lead.
    val index = ShardRing.generateIndex(Seq("a", "b", "c", "d", "e"), 10, 5)
    Seq("a", "b", "c", "d", "e").foreach { h =>
      (0 until 20).foreach { seed =>
        val order = index.prioritizeHosts(5, Set(h), new scala.util.Random(seed))
        assert(order.head === h, s"seed $seed")
        assert(order.toSet === index.hostSet(5), "a permutation of the replica set")
      }
    }
    assert(index.prioritizeHosts(99, _ => true) === Seq.empty)
  }

  test("two-host serving round-trip: ring-localized readers cover every key r times") {
    import spark.implicits._
    val root = scratch("ring-domain")
    val n = 5
    val store = DomainStore.create(
      root, DomainSpec(n, persistenceFormat = DomainSpec.KvSorted), conf)
    val pairs = (0 until 300).map(i => s"rk$i" -> s"rv$i")
    store.write(
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
      1L)

    val hosts = Seq("hostA", "hostB", "hostC")
    val ring = ShardRing.generateIndex(hosts, n, replication = 2)
    val readers = hosts.map { h =>
      val dest = new Path(scratch(s"ring-local-$h"))
      val copied = store.localizeForHost(1L, dest, ring, h)
      assert(copied === ring.shardSet(h).toSeq.sorted, s"$h localized shard set")
      h -> KvDomainReader.localized(dest.toString, store.spec, conf)
    }
    try {
      pairs.foreach { case (k, v) =>
        val shard = ShardIndex.shardIndex(k.getBytes("UTF-8"), n)
        val answering = readers.collect {
          case (h, r) if r.get(k.getBytes("UTF-8")).exists(new String(_, "UTF-8") == v) => h
        }
        // exactly the ring's replica set answers — nobody else holds the
        // shard, and both replicas serve identical bytes
        assert(answering.toSet === ring.hostSet(shard), s"key $k (shard $shard)")
        assert(answering.size === 2, s"key $k replicated twice")
      }
      // replica try-order is always drawn from the hosts that can answer
      val order = ring.prioritizeHosts(3, Set("hostB"), new scala.util.Random(7))
      assert(order.toSet === ring.hostSet(3))
    } finally readers.foreach(_._2.close())
    // a host outside the ring fails loud, not empty
    intercept[IllegalArgumentException](
      store.localizeForHost(1L, new Path(scratch("ring-local-x")), ring, "ghost"))
    // a ring generated for a DIFFERENT shard count fails loud: localizing
    // from it would leave whole shards on no host (silent misses)
    val smallRing = ShardRing.generateIndex(hosts, 3, replication = 2)
    val e = intercept[IllegalArgumentException](
      store.localizeForHost(1L, new Path(scratch("ring-local-y")), smallRing, "hostA"))
    assert(e.getMessage.contains("shardCount = numShards"), e.getMessage)
  }
}
