package graft.store

import scala.util.Random

/**
 * Replica-ring metadata for multi-process serving — WHICH host serves
 * WHICH shards, and in what order a client should try the replicas of a
 * shard. Pure metadata math, no I/O: the serving story is
 * `ShardRing.generateIndex` on a coordinator (or every client — the
 * assignment is deterministic), then each host pulls its subset with
 * [[DomainStore.localizeForHost]] and serves it through
 * [[KvDomainReader.localized]].
 *
 * Semantics are byte-compatible with the reference's ring
 * (`elephantdb-server/src/clj/elephantdb/common/shard.clj:17-41` assigns,
 * `:43-62` prioritizes; `shard_test.clj:5-30` pins the exact maps this
 * object's spec replays): shards are dealt round-robin over the host
 * cycle, `replication` passes over the full shard range, and a host that
 * already holds the shard loses its turn (the cursor consumes it and
 * moves on). The resulting balance property — every shard on exactly
 * `replication` distinct hosts, host loads differing by at most the
 * deal granularity — is what the reference's daemon relied on.
 */
object ShardRing {

  /** The two-way routing index a domain serves through: host → shard set
    * for the pull side ("what do I localize?"), shard → host set for the
    * query side ("who can answer this key?"). */
  final case class Index(
      hostsToShards: Map[String, Set[Int]],
      shardsToHosts: Map[Int, Set[String]]) {

    /** Shards hosted by `host` (empty set: host got no shards — more
      * hosts than shard slots, same as the reference's absent map key). */
    def shardSet(host: String): Set[Int] = hostsToShards.getOrElse(host, Set.empty)

    /** Hosts holding `shard` (empty set: shard id outside the domain). */
    def hostSet(shard: Int): Set[String] = shardsToHosts.getOrElse(shard, Set.empty)

    /** Replica try-order for `shard`: hosts matching `preferred` first
      * (the reference passed `#{localhost}` so a co-located replica is
      * probed before the network), the rest after, each group in a
      * random order drawn from `rnd` — randomization spreads load across
      * equivalent replicas, exactly the reference's `(shuffle hosts)`
      * before prioritizing. Empty for an unknown shard. */
    def prioritizeHosts(
        shard: Int,
        preferred: String => Boolean,
        rnd: Random = new Random()): Seq[String] = {
      val shuffled = rnd.shuffle(hostSet(shard).toSeq.sorted)
      val (pref, rest) = shuffled.partition(preferred)
      pref ++ rest
    }
  }

  /**
   * Deal `shardCount` shards over `hosts` round-robin, `replication`
   * passes, skipping (and consuming the turn of) any host that already
   * holds the shard. Hosts that never get a shard are absent from the
   * map. Deterministic in (hosts order, shardCount, replication).
   *
   * Reference trace (`shard_test.clj:8-13`):
   * {{{
   * computeHostToShards(Seq("a","b"), 5, 1)
   *   == Map("a" -> Set(0,2,4), "b" -> Set(1,3))
   * computeHostToShards(Seq("a","b","c"), 5, 2)
   *   == Map("a" -> Set(0,1,3,4), "b" -> Set(1,2,4), "c" -> Set(0,2,3))
   * }}}
   */
  def computeHostToShards(
      hosts: Seq[String],
      shardCount: Int,
      replication: Int): Map[String, Set[Int]] = {
    require(hosts.nonEmpty, "ring: no hosts")
    require(hosts.distinct.length == hosts.length, s"ring: duplicate hosts in $hosts")
    require(shardCount >= 1, s"ring: shardCount must be >= 1, got $shardCount")
    require(replication >= 1, s"ring: replication must be >= 1, got $replication")
    // The reference's safe-assert: each shard needs `replication` DISTINCT
    // hosts, so more replicas than hosts cannot be satisfied.
    require(hosts.length >= replication,
      s"ring: replication $replication greater than number of hosts (${hosts.length})")
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Set[Int]]
    val cycle = Iterator.continually(hosts).flatten
    var pass = 0
    while (pass < replication) {
      var shard = 0
      while (shard < shardCount) {
        // Skip hosts already holding this shard; each skip consumes the
        // host's turn (the reference's drop-while over the infinite
        // cycle). Bounded: at most `pass` hosts hold the shard, and
        // pass < replication <= hosts.length.
        var host = cycle.next()
        var skipped = 0
        while (acc.getOrElse(host, Set.empty).contains(shard)) {
          skipped += 1
          assert(skipped <= hosts.length, s"ring: no host free for shard $shard")
          host = cycle.next()
        }
        acc.update(host, acc.getOrElse(host, Set.empty) + shard)
        shard += 1
      }
      pass += 1
    }
    acc.toMap
  }

  /** Build the two-way [[Index]] for one domain (reference
    * `generate-index`): the forward map from [[computeHostToShards]] and
    * its inversion. Every shard in `[0, shardCount)` has an entry on the
    * shard side (replication >= 1 guarantees at least one host each). */
  def generateIndex(hosts: Seq[String], shardCount: Int, replication: Int): Index = {
    val fwd = computeHostToShards(hosts, shardCount, replication)
    val inv = fwd.toSeq
      .flatMap { case (h, ss) => ss.iterator.map(_ -> h) }
      .groupMap(_._1)(_._2)
      .map { case (s, hs) => s -> hs.toSet }
    Index(fwd, inv)
  }
}
