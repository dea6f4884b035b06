package graft

import java.util.Properties

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/**
 * Declarative ring/deployment configuration — the reference boots a
 * serving ring from two conf files (`elephantdb-server/example/
 * global-conf.clj:1-5`: `:hosts`, `:replication`, `:port`, `:domains`;
 * `example/local-conf.clj:1-3`: `:local-root`, `:download-rate-limit`,
 * `:update-interval-s`; parsed + defaulted at `common/config.clj:28-58`),
 * and so does graft: `graft.Serve --conf <global> <local> <host>` stands
 * up a self-pulling serving daemon, `RingClient.fromConf` a client, with
 * no Scala written by the deployer.
 *
 * Format: java.util.Properties (the JVM's native conf syntax — no new
 * dependency, comments + escapes for free). The GLOBAL file is shared by
 * every box (the reference stored it on HDFS — it is read through the
 * Hadoop FileSystem of its path, so `hdfs://…/global.conf` works); the
 * LOCAL file is per machine.
 *
 * Global keys:
 * {{{
 * hosts = hA, hB, hC            # ring membership, ORDER IS LOAD-BEARING
 *                               # (the shard deal is deterministic in it);
 *                               # an entry may carry an explicit connect
 *                               # address: name=address:port (single-box
 *                               # rings, NAT) — bare names connect to
 *                               # name:port
 * replication = 1               # default 1 (reference DEFAULT-GLOBAL-CONFIG)
 * port = 3578                   # default 3578 (ditto)
 * domain.<name> = <sourceRoot>  # central store each daemon pulls from
 *                               # (the reference's :domains map)
 * }}}
 *
 * Local keys:
 * {{{
 * local.root = /data/graft                # REQUIRED: this box's localized root
 * update.interval.s = 60                  # pull + refresh cadence (reference
 *                                         # DEFAULT-LOCAL-CONFIG)
 * download.rate.limit.kbps = 1024         # optional transfer throttle; absent =
 *                                         # unthrottled (the reference defaulted
 *                                         # to 128 KB/s — a surprise throttle
 *                                         # that slow cripples a modern pull, so
 *                                         # graft throttles only when asked)
 * cleanup.keep = 0                        # local version GC: 0 = never delete,
 *                                         # else keep newest N (>= 2 — the
 *                                         # just-retired version must outlive
 *                                         # in-flight lookups)
 * http.port = 8080                        # optional dashboard
 * fs.<key> = <value>                      # Hadoop conf entries applied before
 *                                         # any filesystem is touched — the
 *                                         # reference's :hdfs-conf/:blob-conf
 *                                         # (local-conf.clj:4, config.clj:25-28):
 *                                         # e.g. fs.defaultFS, credentials for
 *                                         # the central stores' FS
 * }}}
 */
object ServeConfig {

  /** One ring member: `name` is the ring identity (the shard deal and
    * `localizeForHost` key on it); `address:port` is how clients and
    * peers CONNECT to it. Bare `hosts` entries use the name as address
    * and the global port. */
  final case class HostEntry(name: String, address: String, port: Int)

  final case class Global(
      hosts: Seq[HostEntry],
      replication: Int,
      port: Int,
      domains: Map[String, String]) {
    def host(name: String): HostEntry =
      hosts.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"host '$name' not in the global conf's ring " +
          s"(hosts: ${hosts.map(_.name).mkString(", ")})"))
  }

  final case class Local(
      localRoot: String,
      updateIntervalS: Int,
      downloadRateLimitKbps: Option[Int],
      cleanupKeep: Int,
      httpPort: Option[Int],
      fsConf: Map[String, String] = Map.empty) {
    /** A COPY of `base` with this conf's `fs.*` entries applied — the
      * Configuration every FS touch of a conf boot goes through (the
      * reference threaded :hdfs-conf/:blob-conf the same way). The
      * caller's object is never mutated. */
    def hadoopConf(base: Configuration): Configuration = {
      val c = new Configuration(base)
      fsConf.foreach { case (k, v) => c.set(k, v) }
      c
    }
  }

  /** Read + validate the shared global conf through the Hadoop
    * FileSystem of `path` (local paths work unchanged; so does an
    * `hdfs://` one, exactly the reference's deploy shape). */
  def readGlobal(path: String, conf: Configuration): Global = {
    val props = load(path, conf)
    val port = intKey(props, "port", default = Some(3578), path)
    val hostsRaw = Option(props.getProperty("hosts")).map(_.trim).getOrElse(
      throw new IllegalArgumentException(s"$path: missing required key 'hosts'"))
    val hosts = hostsRaw.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { entry =>
      entry.split("=", 2) match {
        case Array(name) => HostEntry(name.trim, name.trim, port)
        case Array(name, addr) =>
          addr.split(":", 2) match {
            case Array(a, p) =>
              val pn = try p.trim.toInt catch {
                case _: NumberFormatException => throw new IllegalArgumentException(
                  s"$path: host entry '$entry' has a non-numeric port")
              }
              HostEntry(name.trim, a.trim, pn)
            case _ => throw new IllegalArgumentException(
              s"$path: host entry '$entry' must be name or name=address:port")
          }
      }
    }
    require(hosts.nonEmpty, s"$path: 'hosts' is empty")
    require(hosts.map(_.name).distinct.length == hosts.length,
      s"$path: duplicate host names in 'hosts'")
    import scala.jdk.CollectionConverters._
    val domains = props.stringPropertyNames().asScala.toSeq
      .filter(_.startsWith("domain."))
      .map(k => k.stripPrefix("domain.") -> props.getProperty(k).trim)
      .toMap
    require(domains.nonEmpty, s"$path: no 'domain.<name> = <sourceRoot>' entries")
    domains.foreach { case (n, root) =>
      require(n.nonEmpty && root.nonEmpty, s"$path: empty domain entry '$n' -> '$root'") }
    val g = Global(hosts,
      replication = intKey(props, "replication", default = Some(1), path),
      port = port, domains = domains)
    require(g.replication >= 1 && g.replication <= hosts.length,
      s"$path: replication ${g.replication} outside [1, ${hosts.length}] " +
        "(each shard needs that many DISTINCT hosts)")
    g
  }

  /** Read + validate a box-local conf (same loader — a local path reads
    * through the local FileSystem). */
  def readLocal(path: String, conf: Configuration): Local = {
    val props = load(path, conf)
    val localRoot = Option(props.getProperty("local.root")).map(_.trim).getOrElse(
      throw new IllegalArgumentException(s"$path: missing required key 'local.root'"))
    val keep = intKey(props, "cleanup.keep", default = Some(0), path)
    require(keep == 0 || keep >= 2,
      s"$path: cleanup.keep $keep — 0 disables GC, otherwise keep >= 2 " +
        "(the just-retired version must outlive in-flight lookups)")
    val interval = intKey(props, "update.interval.s", default = Some(60), path)
    require(interval >= 1, s"$path: update.interval.s must be >= 1, got $interval")
    import scala.jdk.CollectionConverters._
    val fsConf = props.stringPropertyNames().asScala.toSeq
      .filter(_.startsWith("fs."))
      .map(k => k -> props.getProperty(k).trim)
      .toMap
    Local(
      localRoot = localRoot,
      updateIntervalS = interval,
      downloadRateLimitKbps =
        optIntKey(props, "download.rate.limit.kbps", path).map { v =>
          require(v >= 1, s"$path: download.rate.limit.kbps must be >= 1, got $v"); v
        },
      cleanupKeep = keep,
      httpPort = optIntKey(props, "http.port", path),
      fsConf = fsConf)
  }

  private def load(path: String, conf: Configuration): Properties = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try { val props = new Properties(); props.load(in); props }
    finally in.close()
  }

  private def intKey(
      props: Properties, key: String, default: Option[Int], path: String): Int =
    optIntKey(props, key, path).orElse(default).getOrElse(
      throw new IllegalArgumentException(s"$path: missing required key '$key'"))

  private def optIntKey(props: Properties, key: String, path: String): Option[Int] =
    Option(props.getProperty(key)).map(_.trim).filter(_.nonEmpty).map { v =>
      try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$path: key '$key' must be an integer, got '$v'")
      }
    }
}
