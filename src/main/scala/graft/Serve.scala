package graft

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.core.DomainSpec
import graft.store.{DomainCatalog, KvDomainReader, KvServer}

/**
 * Standalone serving daemon: every servable (kv-sorted / kv-sorted-z)
 * domain under a catalog root, exposed over [[KvServer]]'s protocol,
 * with a background updater that BOTH follows new publishes via
 * [[KvDomainReader.refresh]] and performs initial loads — domains that
 * first publish (or appear) after boot are discovered on the next
 * sweep, exactly like the reference's updater
 * (`common/database.clj:95–107` ran `update-all!` on an interval, which
 * also loaded not-yet-loaded domains). Spark-free end to end: a serving
 * box needs the jar, not a cluster.
 *
 * Usage: `runMain graft.Serve <catalogRoot> [port] [refreshSeconds]`
 * (port 0 = ephemeral, printed on startup; refresh 0 = never poll).
 * Booting before the first publish is legal when polling is on: the
 * census starts empty and fills as publishes land (with polling
 * disabled an empty boot fails loudly — it could never recover).
 *
 * Non-servable domains (parquet/orc — Spark scan engines) are skipped
 * with a notice; serve an exported `kv-sorted` twin instead (see
 * DomainStore.transcode).
 *
 * Shutdown: a dedicated STOP FLAG governs exit (checked between every
 * per-domain step; a wake latch ends the inter-sweep wait instantly),
 * and close() ALSO interrupts — solely to unblock in-flight
 * interruptible I/O. The two compose: filesystem clients routinely
 * wrap interrupts (clearing the flag, surfacing InterruptedIOException
 * or wrappers), so no code here classifies interrupt-derived
 * exceptions — a wrapped interrupt just falls into the ordinary catch
 * and the very next flag check exits.
 */
object Serve {

  /** Every this-many sweeps the format cache is dropped and re-read —
    * 10 min of staleness at the default 30 s poll, the bound on how
    * long a purge+recreate that was never observed absent can be
    * missed. */
  val FormatRecheckSweeps: Int = 20

  /** Parse a log-once notice key back to its domain name. Keys are
    * '<kind>:<name>' (no kind contains ':', and names are Hadoop Path
    * components so never contain ':'). The shape is ENFORCED, not
    * assumed: a colon-free key would otherwise parse as all-name and be
    * healed by an unrelated domain whose name equals the key. */
  private[graft] def noticeName(k: String): String = {
    val i = k.lastIndexOf(':')
    require(i >= 0, s"notice key '$k' is not '<kind>:<name>'")
    k.substring(i + 1)
  }

  /** A started daemon: the bound server, its live readers, and the
    * updater thread. `close()` stops all three (readers included — the
    * handle owns them, unlike a bare KvServer). */
  final class Handle(
      val server: KvServer,
      served: ConcurrentHashMap[String, KvDomainReader],
      stop: AtomicBoolean,
      wake: CountDownLatch,
      updater: Option[Thread],
      val dashboard: Option[HttpDashboard] = None) extends AutoCloseable {
    def boundPort: Int = server.boundPort
    def dashboardPort: Option[Int] = dashboard.map(_.boundPort)
    def readers: Map[String, KvDomainReader] = {
      import scala.jdk.CollectionConverters._
      served.asScala.toMap
    }
    def close(): Unit = {
      // stop the updater FIRST and wait it out: a sweep in flight must
      // not run against closed readers or call the log callback after
      // close() has returned. The FLAG governs exit; the interrupt only
      // unblocks in-flight interruptible I/O (safe now — a wrapped or
      // swallowed interrupt just logs once and hits the flag check).
      stop.set(true)
      wake.countDown()
      // wait until the thread is actually DEAD — the 'no log callback
      // after close()' guarantee is absolute; see Threads.joinUntilDead
      updater.foreach(Threads.joinUntilDead(_))
      dashboard.foreach(d => try d.close() catch { case _: Exception => () })
      server.close()
      readers.values.foreach(r => try r.close() catch { case _: Exception => () })
    }
  }

  /**
   * Serve every servable domain under `root`; discover late ones.
   *
   * `cleanupKeep` > 0 reaps old local versions after each hot-swap,
   * keeping the newest N — the reference updater's `cleanup-domain!`
   * (common/domain.clj:126-139, run around every `attempt-update!`
   * cycle, domain.clj:433,447): a serving box following publishes would
   * otherwise accumulate every version it ever served. OPT-IN (default
   * 0 = never delete) and only for daemons whose root is box-local (the
   * `localizeForHost` flow, like the reference's local store): on a
   * SHARED catalog root, cleanup would reap versions other readers and
   * time-travel queries still use. Keep ≥ 2 leaves the just-retired
   * version on disk while its last in-flight lookups drain.
   */
  def start(
      root: String,
      conf: Configuration,
      port: Int = 0,
      refreshMillis: Long = 30000L,
      log: String => Unit = println,
      httpPort: Option[Int] = None,
      cleanupKeep: Int = 0): Handle = {
    require(cleanupKeep == 0 || cleanupKeep >= 2,
      s"cleanupKeep $cleanupKeep: 0 disables cleanup; otherwise keep >= 2 " +
        "so the just-retired version stays on disk while in-flight " +
        "lookups on the old generation drain (keep = 1 would reap it " +
        "immediately and those lookups die with FileNotFoundException)")
    val cat = new DomainCatalog(root, conf)
    val served = new ConcurrentHashMap[String, KvDomainReader]()
    val stop = new AtomicBoolean(false)
    val wake = new CountDownLatch(1)
    // log-once keys: every sweep RETRIES everything un-served (publishes
    // land late, transient FS errors heal), but steady-state conditions
    // log only on first sight — a daemon polling every 30 s must not
    // spam its log forever. Error keys carry the exception class, so a
    // CHANGED root cause logs anew.
    val noticed = ConcurrentHashMap.newKeySet[String]()
    // format censuses are cached per name (a spec read per parquet
    // domain per sweep adds up over a daemon's lifetime). Two
    // invalidation paths: names gone from the catalog are evicted below
    // (purge observed by a sweep), and the whole cache re-checks every
    // FormatRecheckSweeps sweeps — a purge+recreate under the same name
    // INSIDE one poll interval (never observed absent) is picked up
    // within bounded staleness instead of never
    val knownFormat = new ConcurrentHashMap[String, String]()
    val sweepCounter = new java.util.concurrent.atomic.AtomicLong(0)
    // highest served version already GC'd per domain (cleanupKeep > 0):
    // one cleanup per advance, not one per sweep
    val cleanedAt = new ConcurrentHashMap[String, Long]()

    // one catalog sweep: open newly-servable domains, register them.
    // Failures are isolated PER DOMAIN — one corrupt domain-spec must
    // not starve every alphabetically-later domain from loading.
    // SERIALIZED: the updater thread and remote UPDATE_ALL requests
    // (connection threads) both sweep — unserialized, two sweeps racing
    // the same unloaded domain would each pass the containsKey check,
    // each open a reader, and the loser's overwritten reader would LEAK
    // its shard handles for the life of the process. Sweeps are rare and
    // idempotent, so waiting the other one out is free.
    val sweepLock = new Object
    def loadNew(server: Option[KvServer]): Unit = sweepLock.synchronized {
      if (sweepCounter.getAndIncrement() % Serve.FormatRecheckSweeps == 0)
        knownFormat.clear()
      val names = cat.listDomains
      // prune state for vanished domains (catalog churn must not
      // accrete) — but keep keys for names still SERVED: their reader
      // outlives the catalog entry, and re-adding its refresh-failure
      // key every sweep would log it every sweep
      val nameSet = names.toSet
      def retired(n: String) = !nameSet.contains(n) && !served.containsKey(n)
      knownFormat.keySet.removeIf(retired(_))
      noticed.removeIf(k => retired(Serve.noticeName(k)))
      names.foreach { name =>
        if (!stop.get() && !served.containsKey(name)) {
          try {
            val fmt = knownFormat.computeIfAbsent(
              name, _ => cat.domain(name).spec.persistenceFormat)
            if (fmt != DomainSpec.KvSorted && fmt != DomainSpec.KvSortedZ) {
              // the key carries the format so a purge+recreate that
              // CHANGES it (parquet -> orc) logs anew, same design as
              // the exception-class-carrying error keys
              if (noticed.add(s"fmt-$fmt:$name"))
                log(s"[serve] skip $name: format '$fmt' is a Spark scan engine, not " +
                  "servable (export a kv-sorted twin with DomainStore.transcode)")
            } else {
              try {
                val r = KvDomainReader.open(new Path(root, name).toString, conf)
                if (stop.get()) {
                  // shutdown raced the open: registering now would leak
                  // the reader past close()'s cleanup
                  r.close()
                } else {
                  // register with the SERVER before exposing via readers:
                  // an observer seeing the reader must be able to query it
                  server.foreach(_.register(name, r))
                  served.put(name, r)
                  // double-check: close() may have swept `served` between
                  // the check above and the put
                  if (stop.get() && served.remove(name, r)) r.close()
                  else {
                    noticed.removeIf(k => Serve.noticeName(k) == name)
                    log(s"[serve] loaded $name at version ${r.servedVersion}")
                  }
                }
              } catch {
                // no published version yet: retried on the next sweep (the
                // reference updater performed initial loads the same way)
                case e: IllegalStateException =>
                  if (noticed.add(s"unpub:$name"))
                    log(s"[serve] not yet loadable $name: ${e.getMessage}")
              }
            }
          } catch {
            case e: Exception =>
              if (noticed.add(s"err-${e.getClass.getSimpleName}:$name"))
                log(s"[serve] cannot inspect $name (will keep retrying): $e")
          }
        }
      }
    }

    // the census STATUS reports over the wire: catalog ∪ served, so a
    // domain the daemon has not (yet) loaded still answers — "loading"
    // (published but unswept, or nothing published yet) and "failed"
    // (no publish, failure marker) are exactly what a deployer polls
    // for before pointing traffic here. Non-servable formats (parquet/
    // orc Spark scan engines) are excluded: they will never serve, and
    // an eternally-"loading" entry would pin isFullyLoaded false.
    def statusSnapshot(
        filter: Option[String] = None): Seq[graft.store.ServedDomainStatus] = {
      import scala.jdk.CollectionConverters._
      // the LISTING gets the same hiccup tolerance as the per-domain
      // metadata below: a transient catalog-FS error must not fail the
      // whole STATUS answer while every served domain could truthfully
      // report "ready" — fall back to the served census
      val catalogNames =
        try cat.listDomains catch { case _: Exception => Seq.empty[String] }
      val all = (catalogNames ++ served.keySet.asScala.toSeq).distinct.sorted
      // a named query narrows BEFORE the per-domain metadata reads: one
      // domain's status costs one domain's I/O, not the catalog's
      filter.fold(all)(n => all.filter(_ == n)).flatMap { name =>
        val reader = served.get(name)
        if (reader != null) {
          // serving = ready at the reader's version; the catalog adds
          // what the reader can't know (newer publishes, in-flight
          // builds). A catalog hiccup must not unserve a ready answer.
          val (latest, updating) =
            try { val m = cat.metadata(name); (m.latestVersion.getOrElse(-1L), m.updating) }
            catch { case _: Exception => (reader.servedVersion, false) }
          Some(graft.store.ServedDomainStatus(
            name, "ready", reader.servedVersion, latest, updating))
        } else
          try {
            val fmt = knownFormat.computeIfAbsent(
              name, _ => cat.domain(name).spec.persistenceFormat)
            if (fmt != DomainSpec.KvSorted && fmt != DomainSpec.KvSortedZ) None
            else {
              val m = cat.metadata(name)
              // the catalog says "ready" the moment a version publishes;
              // from THIS daemon's view it is loading until swept in
              val st = if (m.status == "ready") "loading" else m.status
              Some(graft.store.ServedDomainStatus(
                name, st, -1L, m.latestVersion.getOrElse(-1L), m.updating))
            }
          } catch {
            // uninspectable right now (transient FS error): the sweep
            // retries it, so "loading" is the truthful answer
            case _: Exception => Some(graft.store.ServedDomainStatus(
              name, "loading", -1L, -1L, updating = false))
          }
      }
    }

    loadNew(None)
    val server =
      try {
        import scala.jdk.CollectionConverters._
        new KvServer(served.asScala.toMap, port,
          statusProvider = Some(f => statusSnapshot(f)), log = log)
      } catch {
        case e: Throwable =>
          // a bind failure must not abandon the opened readers
          served.values().forEach(r => try r.close() catch { case _: Exception => () })
          throw e
      }
    // remote UPDATE_ALL = the updater's sweep on demand: load domains
    // that published after boot, then (server-side) refresh every
    // served one — the reference's updateAll RPC kicked the same cycle
    server.onUpdateAll(() => loadNew(Some(server)))
    if (refreshMillis <= 0 && served.isEmpty) {
      // with polling disabled the census can never fill: an empty boot
      // (mistyped root, nothing published) must fail loudly, exactly as
      // a poller-less daemon would otherwise answer 'no such domain' to
      // everything forever with zero signal
      server.close()
      throw new IllegalStateException(
        s"no servable domain under $root and refresh polling is disabled")
    }
    log(s"[serve] serving ${server.domainNames.mkString(", ")} on port ${server.boundPort}")

    val updater =
      if (refreshMillis <= 0) None
      else Some {
        val t = new Thread(() => {
          while (!stop.get()) {
            try {
              // the latch ends the wait INSTANTLY on close() — no
              // interrupt needed, so nothing downstream can swallow it
              wake.await(refreshMillis, TimeUnit.MILLISECONDS)
            } catch { case _: InterruptedException => () } // stop flag governs
            if (!stop.get()) {
              // refresh the loaded, then look for late arrivals; catch
              // THROWABLE per step — an Error (or a throwing log
              // callback) must never kill the updater silently, leaving
              // the daemon pinned to a stale version with no signal
              served.forEach { (name, r) =>
                if (!stop.get()) try {
                  val swapped = r.refresh()
                  // ANY successful refresh call heals the failure notice
                  // (true or false) — otherwise a transient outage would
                  // suppress logs for the next same-class outage forever
                  noticed.removeIf(k =>
                    k.startsWith("refresh-") && Serve.noticeName(k) == name)
                  if (swapped)
                    log(s"[serve] $name hot-swapped to version ${r.servedVersion}")
                  // post-swap disk GC (opt-in): keyed on the SERVED
                  // version advancing, so a swap done remotely (REFRESH
                  // over the wire) is cleaned by the next sweep too
                  if (cleanupKeep > 0) {
                    val v = r.servedVersion
                    if (cleanedAt.getOrDefault(name, Long.MinValue) < v) {
                      // the served version rides along as the FLOOR: a
                      // publish racing this GC must never push what
                      // lookups are reading out of the newest-N window
                      new graft.store.VersionedStore(
                        new Path(root, name), conf).cleanup(cleanupKeep, v)
                      cleanedAt.put(name, v)
                      log(s"[serve] $name cleaned old versions (kept $cleanupKeep)")
                    }
                  }
                } catch {
                  case e: Throwable =>
                    try {
                      // during shutdown the close() interrupt surfaces
                      // here as a wrapped IO failure — not a real retry
                      // situation, don't log it as one
                      if (!stop.get() &&
                        noticed.add(s"refresh-${e.getClass.getSimpleName}:$name"))
                        log(s"[serve] refresh $name failed (will keep retrying): $e")
                    } catch { case _: Throwable => () }
                }
              }
              if (!stop.get()) try loadNew(Some(server))
              catch {
                case e: Throwable =>
                  try log(s"[serve] catalog sweep failed: $e")
                  catch { case _: Throwable => () }
              }
            }
          }
        }, "serve-updater")
        t.setDaemon(true)
        t.start()
        t
      }
    // the dashboard renders the SAME census STATUS answers from, plus
    // per-shard tables off the live readers — started last so a bind
    // failure tears down cleanly via the handle-less paths above
    val dashboard = httpPort.map { hp =>
      try {
        import scala.jdk.CollectionConverters._
        val d = HttpDashboard.start(
          hp,
          () => statusSnapshot(),
          () => served.asScala.toMap,
          () => server.boundPort,
          () => server.metricsSnapshot())
        log(s"[serve] dashboard on http://127.0.0.1:${d.boundPort}/")
        d
      } catch {
        case e: Throwable =>
          stop.set(true); wake.countDown()
          // same discipline as Handle.close(): an interrupted caller must
          // not abort this teardown (it would leak the bound port + every
          // reader AND swallow the bind diagnostic)
          updater.foreach(Threads.joinUntilDead(_, lapMillis = 1000L))
          server.close()
          served.values().forEach(r => try r.close() catch { case _: Exception => () })
          throw e
      }
    }
    new Handle(server, served, stop, wake, updater, dashboard)
  }

  /** A conf-booted daemon: the serving [[Handle]] plus the pull thread
    * that follows central publishes. `close()` stops the puller FIRST
    * (same join-until-dead discipline as [[Handle.close]]), then the
    * serving handle. Teardown is best-effort for in-flight transfers:
    * the interrupt unblocks the COORDINATING puller thread (which fails
    * the in-flight local version before exiting), but shard copies
    * running on the parallel-collections common pool are not
    * interruptible mid-chunk — they drain on their own and any partial
    * files they leave under the failed version id are cleared by the
    * next pull's createVersion for that id. Don't reuse the local root
    * for something else the instant close() returns. */
  final class ConfHandle(
      val serve: Handle,
      pullStop: AtomicBoolean,
      pullWake: CountDownLatch,
      puller: Thread) extends AutoCloseable {
    def boundPort: Int = serve.boundPort
    def close(): Unit = {
      pullStop.set(true)
      pullWake.countDown()
      Threads.joinUntilDead(puller)
      serve.close()
    }
  }

  /**
   * Boot a self-pulling ring member purely from conf files (the
   * reference's two-file deploy: `global-conf.clj` + `local-conf.clj`,
   * see [[ServeConfig]]): serve `local.root` on this host's conf'd port,
   * and on every `update.interval.s` sweep pull each conf'd domain's
   * newest central version — restricted to the shards the ring deal
   * assigns THIS host (`localizeForHost` semantics: delta-aware,
   * provenance-reusing, throttled by `download.rate.limit.kbps`) — which
   * the serving updater then hot-swaps. Version GC rides the pull
   * (`cleanup.keep`, 0 = never delete), so [[start]]'s own cleanupKeep
   * stays off: one reaper, one policy.
   *
   * A domain whose central store does not exist yet (or has no publish)
   * is retried every sweep — booting a ring before the first publish is
   * the normal deploy order. A domain the ring assigns no shards of on
   * this host is skipped (more hosts than shards).
   */
  def startFromConf(
      globalPath: String,
      localPath: String,
      hostName: String,
      conf: Configuration,
      log: String => Unit = println): ConfHandle = {
    // local first: its fs.* entries configure the FileSystem everything
    // else (the possibly-remote global conf, the central stores, the
    // pulls) is reached through — the reference's read order
    // (config.clj:60-78 read local, then global via its :blob-conf)
    val l = ServeConfig.readLocal(localPath, conf)
    val fsConf = l.hadoopConf(conf)
    val g = ServeConfig.readGlobal(globalPath, fsConf)
    val me = g.host(hostName)
    val keepLocal = if (l.cleanupKeep == 0) Int.MaxValue else math.max(2, l.cleanupKeep)
    val intervalMs = l.updateIntervalS * 1000L
    // serve first (an empty local root fills as pulls land — start's
    // late-discovery sweep picks new domains up), then pull
    val serveHandle = start(
      l.localRoot, fsConf,
      port = me.port,
      refreshMillis = intervalMs,
      log = log,
      httpPort = l.httpPort,
      cleanupKeep = 0)
    val pullStop = new AtomicBoolean(false)
    val pullWake = new CountDownLatch(1)
    val noticed = ConcurrentHashMap.newKeySet[String]()
    val centrals = new ConcurrentHashMap[String, graft.store.DomainStore]()
    // the ring deal is deterministic in (hosts, numShards, replication),
    // all fixed for the daemon's life per domain shard count — cache it
    // instead of re-dealing O(shards x replication) every sweep (keyed by
    // numShards so a recreated central with a new spec re-deals)
    val rings = new ConcurrentHashMap[(String, Int), graft.store.ShardRing.Index]()
    val puller = new Thread(() => {
      while (!pullStop.get()) {
        g.domains.toSeq.sortBy(_._1).foreach { case (name, srcRoot) =>
          if (!pullStop.get()) {
            try {
              val central = centrals.computeIfAbsent(
                name, _ => graft.store.DomainStore.open(srcRoot, fsConf))
              central.versions.mostRecentVersion.foreach { v =>
                val ring = rings.computeIfAbsent(
                  (name, central.numShards),
                  _ => graft.store.ShardRing.generateIndex(
                    g.hosts.map(_.name), central.numShards, g.replication))
                if (ring.shardSet(me.name).nonEmpty) {
                  // the pull-side reaper needs the SERVED-version floor
                  // (CLAUDE.md / VersionedStore.cleanup(keep, floor)): the
                  // keep-newest-N window can slide past a version the
                  // serving reader is still swapped to (updater stall, two
                  // publishes in one sweep) — reaping it would turn every
                  // lookup into FileNotFoundException
                  val servedFloor = serveHandle.readers.get(name)
                    .map(_.servedVersion).getOrElse(-1L)
                  val delta = central.localizeVersionForHost(
                    v, new Path(l.localRoot, name), ring, me.name,
                    maxKBps = l.downloadRateLimitKbps,
                    keepLocalVersions = keepLocal,
                    keepFloor = servedFloor)
                  // a successful pull HEALS the log-once FAILURE notices
                  // for this domain (the updater loop's rule): without
                  // it, one transient outage suppresses the log for every
                  // later same-class outage forever. Key parsing: notice
                  // keys are "<kind>:<name>" where no kind contains ':'
                  // and a name NEVER contains ':' (it is a Hadoop Path
                  // component), so the exact last-segment match is exact —
                  // all four notice sites share this one idiom
                  // deliberately. The substantive ADVICE r10 fix is the
                  // `noshards` EXCLUSION: it isn't a failure this pull
                  // recovered from, and clearing it would re-log once per
                  // assignment flap.
                  noticed.removeIf(k =>
                    !k.startsWith("noshards:") && Serve.noticeName(k) == name)
                  if (delta.transferred.nonEmpty || delta.reused.nonEmpty)
                    try log(s"[serve] pulled $name v$v (" +
                      s"${delta.transferred.size} transferred, " +
                      s"${delta.reused.size} reused)")
                    catch { case _: Throwable => () }
                } else if (noticed.add(s"noshards:$name"))
                  try log(s"[serve] ring assigns no shards of $name to $hostName — skipping")
                  catch { case _: Throwable => () }
              }
            } catch {
              // THROWABLE, not Exception — the updater loop's rule: an
              // Error (OOM mid-pull, linkage) or a throwing user log
              // callback must never kill the puller silently, leaving
              // the daemon serving an ever-staler version with no signal
              case e: Throwable =>
                // a not-yet-created central store heals on a later sweep;
                // a cached handle gone stale (central recreated) is
                // evicted so the next sweep re-opens
                centrals.remove(name)
                if (!pullStop.get() &&
                  noticed.add(s"pull-${e.getClass.getSimpleName}:$name"))
                  try log(s"[serve] pull $name failed (will keep retrying): $e")
                  catch { case _: Throwable => () }
            }
          }
        }
        // same interrupt discipline as the updater loop: the stop FLAG
        // governs exit; close()'s interrupt (or any stray one) must not
        // kill the loop via an uncaught InterruptedException — a daemon
        // that keeps serving with a silently dead puller goes stale
        if (!pullStop.get())
          try pullWake.await(intervalMs, TimeUnit.MILLISECONDS)
          catch { case _: InterruptedException => () }
      }
    }, "serve-puller")
    puller.setDaemon(true)
    puller.start()
    log(s"[serve] conf boot: host $hostName pulling ${g.domains.size} domain(s) " +
      s"every ${l.updateIntervalS}s into ${l.localRoot}")
    new ConfHandle(serveHandle, pullStop, pullWake, puller)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.Serve <catalogRoot> [port] [refreshSeconds] [httpPort] [cleanupKeep]\n" +
        "   or: graft.Serve --conf <globalConf> <localConf> <hostName>")
    val handle: AutoCloseable =
      if (args(0) == "--conf") {
        require(args.length == 4,
          "usage: graft.Serve --conf <globalConf> <localConf> <hostName>")
        startFromConf(args(1), args(2), args(3), new Configuration())
      } else start(
        args(0),
        new Configuration(),
        port = args.lift(1).map(_.toInt).getOrElse(0),
        refreshMillis = args.lift(2).map(_.toLong * 1000).getOrElse(30000L),
        httpPort = args.lift(3).map(_.toInt),
        cleanupKeep = args.lift(4).map(_.toInt).getOrElse(0))
    sys.addShutdownHook(handle.close())
    Thread.currentThread().join() // serve until killed
  }
}
