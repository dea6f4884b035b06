package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.core.DomainSpec
import graft.store.{DomainCatalog, KvDomainReader, KvServer}

/**
 * Standalone serving daemon: every servable (kv-sorted / kv-sorted-z)
 * domain under a catalog root, exposed over [[KvServer]]'s protocol,
 * with a background updater that follows new publishes via
 * [[KvDomainReader.refresh]] — the reference's deployable server
 * process (`elephantdb-server/src/clj/elephantdb/keyval/core.clj`
 * launched a Thrift service over its local domains, with an updater
 * loop swapping in downloaded versions) re-expressed over this
 * engine's readers. Spark-free end to end: a serving box needs the
 * jar, not a cluster.
 *
 * Usage: `runMain graft.Serve <catalogRoot> [port] [refreshSeconds]`
 * (port 0 = ephemeral, printed on startup; refresh 0 = never poll).
 *
 * Non-servable domains (parquet/orc — Spark scan engines) and domains
 * with no published version are skipped with a notice; serve an
 * exported `kv-sorted` twin instead (see DomainStore.transcode).
 */
object Serve {

  /** A started daemon: the bound server, its readers, and the updater
    * thread. `close()` stops all three (readers included — the handle
    * owns them, unlike a bare KvServer). */
  final class Handle(
      val server: KvServer,
      val readers: Map[String, KvDomainReader],
      updater: Option[Thread]) extends AutoCloseable {
    def boundPort: Int = server.boundPort
    def close(): Unit = {
      updater.foreach(_.interrupt())
      server.close()
      readers.values.foreach(r => try r.close() catch { case _: Exception => () })
    }
  }

  /** Open every servable domain under `root` and start serving. */
  def start(
      root: String,
      conf: Configuration,
      port: Int = 0,
      refreshMillis: Long = 30000L,
      log: String => Unit = println): Handle = {
    val cat = new DomainCatalog(root, conf)
    val readers: Map[String, KvDomainReader] = cat.listDomains.flatMap { name =>
      val domainRoot = new Path(root, name)
      val fmt = cat.domain(name).spec.persistenceFormat
      if (fmt != DomainSpec.KvSorted && fmt != DomainSpec.KvSortedZ) {
        log(s"[serve] skip $name: format '$fmt' is a Spark scan engine, not servable " +
          "(export a kv-sorted twin with DomainStore.transcode)")
        None
      } else {
        try Some(name -> KvDomainReader.open(domainRoot.toString, conf))
        catch {
          case e: IllegalStateException =>
            log(s"[serve] skip $name: ${e.getMessage}") // no published version yet
            None
        }
      }
    }.toMap
    require(readers.nonEmpty, s"no servable domain under $root")
    val server = new KvServer(readers, port)
    log(s"[serve] serving ${readers.keySet.toSeq.sorted.mkString(", ")} " +
      s"on port ${server.boundPort}")
    val updater =
      if (refreshMillis <= 0) None
      else Some {
        val t = new Thread(() => {
          var running = true
          while (running) {
            try Thread.sleep(refreshMillis)
            catch { case _: InterruptedException => running = false }
            if (running) readers.foreach { case (name, r) =>
              try {
                if (r.refresh())
                  log(s"[serve] $name hot-swapped to version ${r.servedVersion}")
              } catch {
                // keep polling: a failed refresh (e.g. the publish is
                // mid-flight) leaves the previous version serving
                case e: Exception => log(s"[serve] refresh $name failed: $e")
              }
            }
          }
        }, "serve-updater")
        t.setDaemon(true)
        t.start()
        t
      }
    new Handle(server, readers, updater)
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
