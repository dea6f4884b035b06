package graft.store

import scala.util.Random


/**
 * Client-side fan-out over a ring of serving readers — the in-process
 * re-expression of the reference's thrift client loop
 * (`elephantdb-server/src/clj/elephantdb/keyval/core.clj:119-134`
 * `multi-get` groups keys by replica set and races/falls over across
 * hosts; `keyval/domain.clj:43-56` `index-keys` attaches each key's
 * prioritized host list; `client.clj` retries `try-direct-multi-get` on
 * the next host after a transport error). Each "host" here is a
 * [[ServingReader]] — in-process [[KvDomainReader]]s over the shard
 * subset [[DomainStore.localizeForHost]] pulled for them, or
 * [[RemoteKvReader]] stubs speaking [[KvServer]]'s protocol to serving
 * processes on other boxes; the routing, prioritization, and failover
 * semantics are identical either way (RemoteServingSpec pins it).
 *
 * Semantics, matched to the reference:
 *  - route key → shard ([[ShardIndex]] md5-mod), shard → replica hosts
 *    via the ring, replicas tried in [[ShardRing.Index.prioritizeHosts]]
 *    order (preferred predicate first — pass the local host — then the
 *    rest, shuffled for load spread);
 *  - a reader ANSWER (present or absent) ends the key's search — only a
 *    thrown failure (closed reader, I/O error) falls over to the next
 *    replica;
 *  - every replica failing (or a shard with no ring entry) throws,
 *    naming the shard and the hosts tried (the reference's
 *    hosts-down-ex), never a silent miss;
 *  - `multiGet` batches per chosen host (ONE density-adaptive
 *    [[KvDomainReader.multiGet]] per host per attempt round), results
 *    aligned with the input.
 */
final class RingClient(
    ring: ShardRing.Index,
    readers: Map[String, ServingReader],
    preferred: String => Boolean = _ => false,
    rnd: Random = new Random(),
    knownShardCount: Option[Int] = None,
    // client-side routing must match the DOMAIN's scheme (registry seam);
    // hash-mod default = every reference-compatible deployment. Serving a
    // custom-scheme domain through a ring requires passing its resolved
    // scheme HERE — conf-booted clients (fromConf) always route hash-mod
    // (see fromConf's doc: misroutes there degrade to loud wrong-host
    // failover via the daemon-side readers, never silent misses).
    scheme: graft.core.ShardScheme = graft.core.ShardScheme.HashMod) extends AutoCloseable {

  require(readers.nonEmpty, "RingClient: no readers")
  require(ring.hostsToShards.keySet.subsetOf(readers.keySet),
    s"ring hosts ${ring.hostsToShards.keySet -- readers.keySet} have no reader")
  /** Shard count from the readers (the DOMAIN's truth — the ring is not
    * authoritative: routing against a mismatched ring must stay loudly
    * detectable, see replicaOrder). A remote stub's numShards is a
    * network round trip, and a host that is DOWN at construction must
    * not prevent building the client — failover exists for exactly that
    * host — so transport failures are tolerated here (the reachable
    * readers still cross-check each other; an execution failure like an
    * unknown domain name stays loud: that is misconfiguration). */
  val numShards: Int =
    // `knownShardCount` = the caller already ran probeShardCount over
    // these same readers (fromConf must, to build the ring first) —
    // re-probing would pay a second full timeout per dark host
    knownShardCount.getOrElse(RingClient.probeShardCount(readers))

  private def replicaOrder(shard: Int): Seq[String] = {
    val order = ring.prioritizeHosts(shard, preferred, rnd)
    if (order.isEmpty) throw new IllegalStateException(
      s"no hosts in the ring for shard $shard (of $numShards) — " +
        "the ring was built for a different shard count")
    order
  }

  /** Point lookup with replica failover. `None` = key absent from the
    * domain (answered by a live replica). */
  def get(key: Array[Byte]): Option[Array[Byte]] = {
    val shard = scheme.shardIndex(key, numShards)
    val order = replicaOrder(shard)
    var lastFailure: Throwable = null
    order.foreach { host =>
      try return readers(host).get(key)
      catch { case e: Exception => lastFailure = e } // fail over to the next replica
    }
    throw new IllegalStateException(
      s"all replicas of shard $shard failed (tried: ${order.mkString(", ")})",
      lastFailure)
  }

  /** Batched lookup: keys group by routed shard, shards group by chosen
    * replica, ONE batched reader call per host; shards whose host fails
    * retry on their next replica (fresh grouping each round). Results
    * align with the input; `Some(null)` = present with a null value. */
  def multiGet(keys: Seq[Array[Byte]]): IndexedSeq[Option[Array[Byte]]] = {
    require(keys.forall(_ != null), "multiGet: null key")
    val out = new Array[Option[Array[Byte]]](keys.length)
    // per shard: the indexed keys + the replica order still untried
    var pending: Seq[(Int, Seq[(Array[Byte], Int)], Seq[String])] =
      keys.zipWithIndex
        .groupBy { case (k, _) => scheme.shardIndex(k, numShards) }
        .map { case (s, ks) => (s, ks.toSeq, replicaOrder(s)) }
        .toSeq
    // written concurrently from hostPool tasks; AtomicReference gives the
    // thread that finally throws "all replicas failed" a happens-before
    // edge to SOME real failure (which one of several is benign)
    val lastFailure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    while (pending.nonEmpty) {
      val exhausted = pending.filter(_._3.isEmpty)
      if (exhausted.nonEmpty) {
        val (s, _, _) = exhausted.head
        throw new IllegalStateException(
          // the reference's hosts-down-ex reports the key's FULL replica
          // set (`:all-hosts`), which is exactly what was tried
          s"all replicas of shard $s failed " +
            s"(tried: ${ring.hostSet(s).toSeq.sorted.mkString(", ")})",
          lastFailure.get())
      }
      // hosts answer in PARALLEL (scatter-gather): readers are
      // thread-safe (socket stubs pool connections, in-process readers
      // are pread-concurrent), and a serial sweep would multiply batch
      // latency by the ring size. Distinct pool from the storage tier's
      // shard fan-out — an in-process reader nests onto THAT pool, and
      // sharing one pool across both tiers could deadlock (ring tasks
      // holding every thread while waiting on queued shard tasks).
      // Per-host failures stay caught inside the task: a down host turns
      // into next-replica retries, exactly as before.
      val attempts = pending.groupBy(_._3.head).toIndexedSeq
      def attemptHost(
          host: String,
          group: Seq[(Int, Seq[(Array[Byte], Int)], Seq[String])])
          : Seq[(Int, Seq[(Array[Byte], Int)], Seq[String])] = {
        val batch = group.flatMap(_._2)
        try {
          val vs = readers(host).multiGet(batch.map(_._1))
          batch.zip(vs).foreach { case ((_, i), v) => out(i) = v }
          Nil // answered
        } catch {
          case e: Exception =>
            lastFailure.set(e)
            group.map { case (s, ks, hs) => (s, ks, hs.tail) } // next replica
        }
      }
      pending =
        if (attempts.length <= 1)
          attempts.flatMap { case (h, g) => attemptHost(h, g) }
        else {
          val tasks = new java.util.ArrayList[
            java.util.concurrent.Callable[Seq[(Int, Seq[(Array[Byte], Int)], Seq[String])]]](
            attempts.length)
          attempts.foreach { case (h, g) => tasks.add(() => attemptHost(h, g)) }
          val futures = RingClient.hostPool.invokeAll(tasks)
          val b = Seq.newBuilder[(Int, Seq[(Array[Byte], Int)], Seq[String])]
          futures.forEach { f =>
            try b ++= f.get()
            catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
          }
          b.result()
        }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /**
   * Globally key-ordered scan of the WHOLE ring: each shard streams from
   * exactly ONE replica (the RANGE op's shard filter — a replicated ring
   * is read once, never once per replica), pages resume after their last
   * key, and the per-shard streams k-way merge client-side into one
   * ordered iterator — the ring twin of [[KvDomainReader.range]]'s
   * globalOrder mode, for ordered exports off a serving ring.
   *
   * Failover: a shard whose replica dies mid-scan resumes EXACTLY (the
   * exclusive-resume contract survives host switches) on its next
   * replica — but only onto the SAME serving version the shard's scan
   * started on; a replica serving a different version counts as a
   * failed attempt (mid-roll, another replica may still hold the scan's
   * version), and a shard with no version-matching replica left fails
   * LOUD — never a torn shard. Different SHARDS may scan different
   * versions (hosts swap independently; mixed-version ring answers were
   * legal in the reference too — same contract as multiGet).
   */
  def rangeScan(
      from: Option[Array[Byte]] = None,
      to: Option[Array[Byte]] = None,
      fromInclusive: Boolean = true,
      toInclusive: Boolean = true,
      pageRecords: Int = RemoteKvReader.DefaultRangePage): Iterator[(Array[Byte], Array[Byte])] = {
    // validate the CALLER's arguments up front: inside the per-replica
    // try they would read as host failures, retried against every
    // replica and reported as "all replicas failed" — an ops alarm for
    // a usage error
    require(pageRecords > 0 && pageRecords <= KvServer.MaxBatch,
      s"rangeScan: pageRecords $pageRecords outside (0, ${KvServer.MaxBatch}]")
    Seq(from, to).flatten.foreach(b => require(b.length <= KvServer.MaxKeyLen,
      s"range bound of ${b.length} bytes exceeds the protocol bound ${KvServer.MaxKeyLen}"))
    // fresh names: inside an Iterator subclass, `to` resolves to
    // Iterator's own to(Factory)
    val (loBound, hiBound) = (from, to)

    final class ShardScan(shard: Int) extends Iterator[(Array[Byte], Array[Byte])] {
      private var buf: IndexedSeq[(Array[Byte], Array[Byte])] = IndexedSeq.empty
      private var idx = 0
      private var exhausted = false
      private var started = false
      private var resumeKey = loBound
      private var resumeInclusive = fromInclusive
      private var version = 0L
      private var versionSet = false
      // STICKY replica order, computed once: re-prioritizing per page
      // would bounce a mid-roll shard between differently-versioned
      // replicas (spurious failed attempts) and keep re-trying a dead
      // host on ~half the pages. The page's winner moves to the front,
      // so after one failover every later page goes straight to the
      // replica that actually answers.
      private var order = replicaOrder(shard)

      private def fetchPage(): Unit = {
        var lastFailure: Throwable = null
        order.foreach { host =>
          try {
            val page = readers(host).rangePage(
              resumeKey, resumeInclusive, hiBound, toInclusive,
              pageRecords, Long.MaxValue, Some(Set(shard)))
            if (page.vLo != page.vHi) throw new IllegalStateException(
              s"shard $shard page straddled a version swap on $host " +
                s"(${page.vLo} -> ${page.vHi})")
            if (versionSet && page.vLo != version) throw new IllegalStateException(
              s"shard $shard: replica $host serves version ${page.vLo}, " +
                s"this scan started on $version")
            // an empty-but-truncated page can make no progress (the
            // resume key cannot advance): a desynced or non-conforming
            // server — discard the attempt loudly instead of re-issuing
            // the identical request forever
            if (page.records.isEmpty && page.truncated)
              throw new IllegalStateException(
                s"shard $shard: $host returned an empty truncated page " +
                  "(protocol violation — a truncated page carries records)")
            if (!versionSet) { version = page.vLo; versionSet = true }
            buf = page.records
            idx = 0
            exhausted = !page.truncated
            if (buf.nonEmpty) {
              resumeKey = Some(buf.last._1)
              resumeInclusive = false
            }
            started = true
            if (order.head != host)
              order = host +: order.filterNot(_ == host)
            return
          } catch {
            case e: Exception => lastFailure = e // next replica
          }
        }
        throw new IllegalStateException(
          s"all replicas of shard $shard failed the range scan " +
            s"(tried: ${ring.hostSet(shard).toSeq.sorted.mkString(", ")})",
          lastFailure)
      }

      def hasNext: Boolean = {
        while (idx >= buf.length && (!exhausted || !started)) fetchPage()
        idx < buf.length
      }
      def next(): (Array[Byte], Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException(s"shard $shard scan exhausted")
        val r = buf(idx)
        idx += 1
        r
      }
    }

    val scans = (0 until numShards).map(new ShardScan(_))
    // prefetch every shard's FIRST page in parallel on the host pool
    // (hasNext forces it): a serial first-record otherwise pays
    // numShards sequential round trips before the merge can emit
    // anything. Later pages fetch lazily as the merge drains — at most
    // one in flight per shard, on the calling thread.
    if (scans.length > 1) {
      val tasks = new java.util.ArrayList[java.util.concurrent.Callable[Unit]](scans.length)
      scans.foreach(s => tasks.add(() => { s.hasNext; () }))
      val futures = RingClient.hostPool.invokeAll(tasks)
      futures.forEach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    }
    KvMerge.byKey(scans)
  }

  /** Hot-swap every underlying reader to the newest version its local
    * root publishes ([[KvDomainReader.refresh]]) — the client half of the
    * reference's `updateAll` RPC (core.thrift:86-87): each host swaps
    * atomically for itself; hosts are independent, so mixed versions
    * during a roll are legal (they were in the reference too — a ring
    * mid-update served old and new versions side by side). Returns
    * host → whether a newer version was swapped in. Readers without
    * version history (bare localized subsets) are reported false rather
    * than failing the whole ring — but ONLY that benign case: a closed
    * reader or a root with no published version still throws, because
    * mapping a broken host to false would be indistinguishable from
    * 'already newest' and the operator would never learn the host is
    * stuck (the silent-miss class this engine fails loudly on). */
  def refreshAll(): Map[String, Boolean] =
    readers.map { case (host, r) =>
      host -> (r.canRefresh && r.refresh())
    }

  /** Ring-level "can I point traffic here?" — every host reports fully
    * loaded (the reference's `isFullyLoaded` RPC asked per host; a
    * deployer asks it of the ring). A host that is DOWN answers false —
    * an unreachable host is not certifiably loaded — but a host speaking
    * the wrong protocol stays LOUD: that is misconfiguration, and
    * reporting it as "still loading" would hide it forever. */
  def isFullyLoaded: Boolean =
    readers.forall { case (_, r) =>
      try r.fullyLoaded
      catch {
        case e: RemoteKvReader.ProtocolException => throw e
        case _: java.io.IOException => false
      }
    }

  /** Ring-level update roll (the reference's `updateAll` across the
    * cluster): every host updates itself — remote hosts run the
    * host-wide UPDATE_ALL op (new-domain sweep + refresh all), in-process
    * readers refresh. Hosts are independent; mixed versions during the
    * roll are legal, exactly as in [[RingClient.updateRing]]. Returns
    * host → (swapped, failed); an unreachable host throws (an operator
    * triggering a roll must learn which host missed it). */
  def updateAll(): Map[String, (Int, Int)] =
    readers.map { case (host, r) => host -> r.updateAll() }

  /** Per-host domain metadata (the reference's `getMetaData` across a
    * ring, core.thrift:90 — here scoped to this client's one domain):
    * host → spec + version pair + the shard subset each host carries
    * with record counts. An unreachable host throws — an ops sweep must
    * learn which host is dark, not silently shrink the census (down
    * hosts are failover's job on the DATA path, not here); a wrong-
    * service answer stays loud naming the host, as at construction. */
  def metadataByHost(): Map[String, DomainMeta] =
    readers.map { case (host, r) => host -> r.metadata() }

  private[store] def reader(host: String): ServingReader = readers(host)

  /** Close every underlying reader. */
  def close(): Unit = readers.values.foreach(r =>
    try r.close() catch { case _: Exception => () })
}

object RingClient {

  /** Probe every reader's shard count in PARALLEL on dedicated threads
    * (not a shared pool: these block on socket I/O up to the read
    * timeout, and a frozen host must cost the caller at most ONE
    * timeout, not one per broken host — nor stall unrelated pool work).
    * A peer speaking the wrong protocol is MISCONFIGURATION and stays
    * loud NAMING the host; so does anything that is neither a plain
    * transport failure NOR a remote execution failure. Unreachability
    * AND a host that answers "no such domain" are both failover's job —
    * the latter is a ring member mid-deploy whose puller has not
    * localized this domain yet (construction must survive it; the data
    * path fails over exactly as for a down host). A domain unknown on
    * EVERY host still fails loud: no reader answers, and the error
    * carries the remote cause. The reachable readers cross-check each
    * other and must agree. */
  private[store] def probeShardCount(readers: Map[String, ServingReader]): Int =
    probeRing(readers, "shard-count")(_.numShards)

  /** fromConf's boot probe: (shard count, shard scheme) from ONE META
    * round trip per host — the scheme gate rides the probe the shard
    * count already pays for. Same host-failure taxonomy as
    * [[probeShardCount]]. */
  private[store] def probeMeta(readers: Map[String, ServingReader]): (Int, String) =
    probeRing(readers, "META (shard count + scheme)")(
      r => { val m = r.metadata(); (m.numShards, m.shardScheme) })

  /** The shared parallel ring probe: every reader asked concurrently (a
    * frozen host costs at most ONE timeout, never one per broken host);
    * down hosts (IOException) and mid-deploy hosts
    * (RemoteServingException) are failover's job, a wrong-protocol peer
    * stays loud, and the reachable answers must AGREE. */
  private def probeRing[A](readers: Map[String, ServingReader], what: String)(
      ask: ServingReader => A): A = {
    val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, A]]()
    val threads = readers.toSeq.map { case (h, r) =>
      val t = new Thread(() => {
        val res =
          try Right(ask(r))
          catch { case e: Throwable => Left(e) } // incl. fatals: rethrown below, never silent
        results.put(h, res)
      }, s"ring-probe-$h")
      t.setDaemon(true); t.start(); t
    }
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    results.asScala.foreach {
      case (h, Left(e: RemoteKvReader.ProtocolException)) =>
        throw new IllegalStateException(s"reader for host $h speaks the wrong protocol", e)
      case (h, Left(e)) if !e.isInstanceOf[java.io.IOException] &&
          !e.isInstanceOf[RemoteServingException] =>
        throw new IllegalStateException(s"$what probe for host $h failed", e)
      case _ => ()
    }
    val known = results.asScala.collect { case (h, Right(n)) => h -> n }.toMap
    if (known.isEmpty) throw new IllegalStateException(
      s"RingClient: no reader among ${readers.keySet.toSeq.sorted.mkString(", ")} " +
        s"answered the $what probe (every host down, or none serves " +
        "this domain)",
      results.asScala.collectFirst { case (_, Left(e)) => e }.orNull)
    require(known.values.toSet.size == 1,
      s"RingClient: readers disagree on the $what probe — they serve " +
        s"different domains: $known")
    known.values.head
  }

  /**
   * Construct a ring client purely from the SAME shared global conf the
   * daemons booted from (`graft.ServeConfig` — hosts/replication/port/
   * domains): one remote stub per conf'd host, shard count probed from
   * the live ring (first host that answers — construction must survive
   * down hosts, that is failover's job; a ring where NO host answers
   * fails loud naming them all), ring deal recomputed deterministically
   * from (hosts order, shard count, replication) — the exact deal the
   * daemons' pulls used, so routing agrees by construction (and stays
   * loudly cross-checked by numShards' probe).
   *
   * Conf-booted clients route HASH-MOD (the only scheme a shared conf can
   * promise), and the construction probe ENFORCES it: the boot-time META
   * round trip carries the domain's `shardScheme` (the reference always
   * knew the scheme because DomainSpec shipped it — DomainSpec.java:46-52),
   * so a custom-scheme domain fails HERE naming the scheme instead of
   * degrading to per-lookup wrong-host failover. Build the client
   * directly with the resolved scheme
   * (`new RingClient(..., scheme = ShardScheme.forName(...))`) instead.
   */
  def fromConf(
      globalPath: String,
      domain: String,
      conf: org.apache.hadoop.conf.Configuration,
      preferred: String => Boolean = _ => false,
      rnd: Random = new Random()): RingClient = {
    val g = graft.ServeConfig.readGlobal(globalPath, conf)
    require(g.domains.contains(domain),
      s"$globalPath: domain '$domain' not configured " +
        s"(domains: ${g.domains.keys.toSeq.sorted.mkString(", ")})")
    val stubs: Map[String, ServingReader] = g.hosts.map { h =>
      h.name -> (new RemoteKvReader(h.address, h.port, domain): ServingReader)
    }.toMap
    // anything thrown from here on must not leak the stubs' pooled
    // sockets — close them all before rethrowing. ONE probe total: the
    // META-based helper learns (and cross-checks) the shard count AND
    // the scheme in one round trip, and the constructor is told not to
    // re-probe (a dark host would otherwise pay its connect timeout
    // twice).
    try {
      val (shardCount, scheme) = probeMeta(stubs)
      if (scheme != graft.core.DomainSpec.HashMod)
        throw new IllegalArgumentException(
          s"RingClient.fromConf: domain '$domain' routes with shard scheme " +
            s"'$scheme', but a conf-booted ring can only route " +
            s"'${graft.core.DomainSpec.HashMod}' — build the client directly " +
            "with the resolved scheme: new RingClient(..., scheme = " +
            s"ShardScheme.forName(\"$scheme\"))")
      new RingClient(
        ShardRing.generateIndex(g.hosts.map(_.name), shardCount, g.replication),
        stubs, preferred, rnd, knownShardCount = Some(shardCount))
    } catch {
      case t: Throwable =>
        stubs.values.foreach(s => try s.close() catch { case _: Exception => () })
        throw t
    }
  }

  /** Shared bounded pool for the per-host scatter of a ring multiGet.
    * Deliberately DISTINCT from [[KvDomainReader.lookupPool]]: an
    * in-process reader's shard fan-out nests inside a ring task, and one
    * shared pool could fill with ring tasks all blocked on shard tasks
    * queued behind them. Two tiers, two pools, no cycle. */
  private[store] lazy val hostPool: java.util.concurrent.ExecutorService = {
    val n = math.max(4, Runtime.getRuntime.availableProcessors())
    java.util.concurrent.Executors.newFixedThreadPool(
      n,
      (r: Runnable) => {
        val t = new Thread(r, "graft-ring-scatter")
        t.setDaemon(true)
        t
      })
  }

  /**
   * One complete ring update cycle — the reference updater daemon's
   * `update/updateAll` (core.thrift:86-87, `common/database.clj:45-57`:
   * download the new version to every host, then swap each server) as a
   * batch orchestration: hosts roll SEQUENTIALLY, each one
   * [[DomainStore.localizeVersionForHost]]-pulling the version into its
   * local versioned root (delta-aware: unchanged shards hardlink/copy
   * locally, only changed ones transfer) and then hot-swapping its reader
   * via [[KvDomainReader.refresh]]. Per-host atomicity: a host's reader
   * always serves a COMPLETE published version — before its swap the old
   * one, after it the new one — and in-flight gets finish on the version
   * they started on. Mixed versions across hosts during the roll are
   * legal, exactly as in the reference. Returns host → per-shard
   * transfer/reuse outcome.
   *
   * Concurrent queries through the client keep answering during the
   * whole roll; a host that fails its pull stops the roll (remaining
   * hosts keep serving the old version — rerun after fixing; the pull is
   * idempotent per version, so completed hosts no-op).
   */
  def updateRing(
      client: RingClient,
      store: DomainStore,
      version: Long,
      ring: ShardRing.Index,
      hostRoots: Map[String, org.apache.hadoop.fs.Path],
      maxKBps: Option[Int] = None): Map[String, DomainStore.LocalizeDelta] = {
    require(ring.hostsToShards.keySet.subsetOf(hostRoots.keySet),
      s"hosts ${ring.hostsToShards.keySet -- hostRoots.keySet} have no local root")
    ring.hostsToShards.keySet.toSeq.sorted.map { host =>
      val r = client.reader(host)
      // served-version FLOOR for the pull-side GC (the CLAUDE.md rule the
      // conf-booted daemons already follow): a host whose previous roll
      // pulled-but-never-swapped holds {served, newer} locally, and the
      // next roll's cleanup(keepLocalVersions=2) would otherwise reap the
      // version the reader is STILL SERVING — every in-flight lookup then
      // dies on a reaped shard file until the refresh below lands. A host
      // that cannot answer the probe (alive-but-slow read timeout, not
      // yet loaded) gets ONE retry, then the CONSERVATIVE fallback: pull
      // without any local reap this roll (cleanupLocal = false) — a
      // floor-less cleanup would silently re-open the reap-the-served-
      // version window the floor exists to close, while a skipped reap
      // only accretes disk until the next successful roll.
      val floor =
        try Some(r.servedVersion) catch { case _: Exception =>
          try Some(r.servedVersion) catch { case _: Exception => None } }
      val delta = store.localizeVersionForHost(
        version, hostRoots(host), ring, host, maxKBps,
        keepFloor = floor.getOrElse(-1L), cleanupLocal = floor.isDefined)
      r.refresh()
      // the pull succeeded and refresh() returned — but refresh() only
      // reports "swapped vs already-newest", not WHICH version: a host
      // whose reader is pinned elsewhere (or whose root resolves a
      // different newest) would otherwise report as successfully rolled.
      // Versions grow monotonically, so >= means the pulled version (or
      // a later one that superseded it mid-roll) is live.
      val serving = r.servedVersion
      if (serving < version) throw new IllegalStateException(
        s"update ring: host $host still serves version $serving after " +
          s"pulling $version — its reader is not backed by ${hostRoots(host)}")
      host -> delta
    }.toMap
  }
}
