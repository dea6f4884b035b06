package graft

import java.util.concurrent.ConcurrentHashMap

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
 */
object Serve {

  /** A started daemon: the bound server, its live readers, and the
    * updater thread. `close()` stops all three (readers included — the
    * handle owns them, unlike a bare KvServer). */
  final class Handle(
      val server: KvServer,
      served: ConcurrentHashMap[String, KvDomainReader],
      updater: Option[Thread]) extends AutoCloseable {
    def boundPort: Int = server.boundPort
    def readers: Map[String, KvDomainReader] = {
      import scala.jdk.CollectionConverters._
      served.asScala.toMap
    }
    def close(): Unit = {
      // stop the updater FIRST and wait it out: a sweep in flight must
      // not run against closed readers or call the log callback after
      // close() has returned
      updater.foreach { t => t.interrupt(); t.join(10000) }
      server.close()
      readers.values.foreach(r => try r.close() catch { case _: Exception => () })
    }
  }

  /** Serve every servable domain under `root`; discover late ones. */
  def start(
      root: String,
      conf: Configuration,
      port: Int = 0,
      refreshMillis: Long = 30000L,
      log: String => Unit = println): Handle = {
    val cat = new DomainCatalog(root, conf)
    val served = new ConcurrentHashMap[String, KvDomainReader]()
    // log-once keys: every sweep RETRIES everything un-served (formats
    // can change via purge+recreate, publishes land late, transient FS
    // errors heal), but steady-state conditions log only on first sight
    // — a daemon polling every 30 s must not spam its log forever
    val noticed = ConcurrentHashMap.newKeySet[String]()

    // one catalog sweep: open newly-servable domains, register them.
    // Failures are isolated PER DOMAIN — one corrupt domain-spec must
    // not starve every alphabetically-later domain from loading.
    def loadNew(server: Option[KvServer]): Unit = cat.listDomains.foreach { name =>
      if (!served.containsKey(name)) {
        try {
          val fmt = cat.domain(name).spec.persistenceFormat
          if (fmt != DomainSpec.KvSorted && fmt != DomainSpec.KvSortedZ) {
            if (noticed.add(s"fmt:$name"))
              log(s"[serve] skip $name: format '$fmt' is a Spark scan engine, not " +
                "servable (export a kv-sorted twin with DomainStore.transcode)")
          } else {
            try {
              val r = KvDomainReader.open(new Path(root, name).toString, conf)
              // register with the SERVER before exposing via readers:
              // an observer seeing the reader must be able to query it
              server.foreach(_.register(name, r))
              served.put(name, r)
              Seq("fmt", "unpub", "err").foreach(k => noticed.remove(s"$k:$name"))
              log(s"[serve] loaded $name at version ${r.servedVersion}")
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
            if (noticed.add(s"err:$name"))
              log(s"[serve] cannot inspect $name (will keep retrying): $e")
        }
      }
    }

    loadNew(None)
    val server =
      try {
        import scala.jdk.CollectionConverters._
        new KvServer(served.asScala.toMap, port)
      } catch {
        case e: Throwable =>
          // a bind failure must not abandon the opened readers
          served.values().forEach(r => try r.close() catch { case _: Exception => () })
          throw e
      }
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
          var running = true
          // an interrupt ANYWHERE (sleep, a blocked refresh, a sweep)
          // means close() wants us gone — stop before the next step, so
          // the join in close() can't be defeated by a swallowed
          // interrupt followed by a full sleep against closed readers
          def interrupted(e: Throwable): Boolean =
            e.isInstanceOf[InterruptedException] || Thread.currentThread().isInterrupted
          while (running) {
            try Thread.sleep(refreshMillis)
            catch { case _: InterruptedException => running = false }
            if (running) {
              // refresh the loaded, then look for late arrivals; catch
              // THROWABLE per step — an Error (or a throwing log
              // callback) must never kill the updater silently, leaving
              // the daemon pinned to a stale version with no signal
              served.forEach { (name, r) =>
                if (running) try {
                  if (r.refresh())
                    log(s"[serve] $name hot-swapped to version ${r.servedVersion}")
                } catch {
                  case e: Throwable if interrupted(e) => running = false
                  case e: Throwable =>
                    try log(s"[serve] refresh $name failed: $e")
                    catch { case _: Throwable => () }
                }
              }
              if (running) try loadNew(Some(server))
              catch {
                case e: Throwable if interrupted(e) => running = false
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
    new Handle(server, served, updater)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Serve <catalogRoot> [port] [refreshSeconds]")
    val handle = start(
      args(0),
      new Configuration(),
      port = args.lift(1).map(_.toInt).getOrElse(0),
      refreshMillis = args.lift(2).map(_.toLong * 1000).getOrElse(30000L))
    sys.addShutdownHook(handle.close())
    Thread.currentThread().join() // serve until killed
  }
}
