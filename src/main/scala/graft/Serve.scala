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
 * Booting before the first publish is legal: the census starts empty
 * and fills as publishes land.
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
    val skippedFormat = ConcurrentHashMap.newKeySet[String]()

    // one catalog sweep: open newly-servable domains, register them
    def loadNew(server: Option[KvServer]): Unit = cat.listDomains.foreach { name =>
      if (!served.containsKey(name) && !skippedFormat.contains(name)) {
        val domainRoot = new Path(root, name)
        val fmt = cat.domain(name).spec.persistenceFormat
        if (fmt != DomainSpec.KvSorted && fmt != DomainSpec.KvSortedZ) {
          skippedFormat.add(name) // permanent: a domain's format never changes
          log(s"[serve] skip $name: format '$fmt' is a Spark scan engine, not servable " +
            "(export a kv-sorted twin with DomainStore.transcode)")
        } else {
          try {
            val r = KvDomainReader.open(domainRoot.toString, conf)
            served.put(name, r)
            server.foreach(_.register(name, r))
            log(s"[serve] loaded $name at version ${r.servedVersion}")
          } catch {
            // no published version yet: retried on the next sweep (the
            // reference updater performed initial loads the same way)
            case e: IllegalStateException => log(s"[serve] not yet loadable $name: ${e.getMessage}")
          }
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
    log(s"[serve] serving ${server.domainNames.mkString(", ")} on port ${server.boundPort}")

    val updater =
      if (refreshMillis <= 0) None
      else Some {
        val t = new Thread(() => {
          var running = true
          while (running) {
            try Thread.sleep(refreshMillis)
            catch { case _: InterruptedException => running = false }
            if (running) {
              // refresh the loaded, then look for late arrivals; catch
              // THROWABLE per step — an Error (or a throwing log
              // callback) must never kill the updater silently, leaving
              // the daemon pinned to a stale version with no signal
              served.forEach { (name, r) =>
                try {
                  if (r.refresh())
                    log(s"[serve] $name hot-swapped to version ${r.servedVersion}")
                } catch {
                  case e: Throwable =>
                    try log(s"[serve] refresh $name failed: $e")
                    catch { case _: Throwable => () }
                }
              }
              try loadNew(Some(server))
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
