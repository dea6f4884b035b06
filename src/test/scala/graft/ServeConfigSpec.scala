package graft

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Parsing + validation of the two-file deployment conf (reference
  * `global-conf.clj`/`local-conf.clj` semantics; see [[ServeConfig]]).
  * Pure file I/O — no Spark, no sockets. */
class ServeConfigSpec extends AnyFunSuite {

  private val conf = new Configuration()

  private def write(name: String, body: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-conf").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, name)
    java.nio.file.Files.writeString(f.toPath, body)
    f.deleteOnExit()
    f.getAbsolutePath
  }

  test("global: defaults, bare + addressed host entries, domain map") {
    val p = write("g.conf",
      """# comment lines and blanks are fine
        |hosts = hA, hB=10.0.0.2:4711, hC
        |domain.users = /central/users
        |domain.graph = hdfs://nn/graph
        |""".stripMargin)
    val g = ServeConfig.readGlobal(p, conf)
    assert(g.replication === 1) // reference DEFAULT-GLOBAL-CONFIG
    assert(g.port === 3578)
    assert(g.hosts === Seq(
      ServeConfig.HostEntry("hA", "hA", 3578),
      ServeConfig.HostEntry("hB", "10.0.0.2", 4711),
      ServeConfig.HostEntry("hC", "hC", 3578)))
    assert(g.domains === Map("users" -> "/central/users", "graph" -> "hdfs://nn/graph"))
    assert(g.host("hB").address === "10.0.0.2")
    val e = intercept[IllegalArgumentException](g.host("nope"))
    assert(e.getMessage.contains("not in the global conf"))
  }

  test("global: validation failures are loud and name the file") {
    def global(body: String) =
      intercept[IllegalArgumentException](
        ServeConfig.readGlobal(write("g.conf", body), conf)).getMessage
    assert(global("domain.d = /x\n").contains("hosts"))
    assert(global("hosts = a, b\n").contains("domain."))
    assert(global("hosts = a, a\ndomain.d = /x\n").contains("duplicate"))
    assert(global("hosts = a\nreplication = 2\ndomain.d = /x\n")
      .contains("replication"))
    assert(global("hosts = a=1.2.3.4\ndomain.d = /x\n")
      .contains("name=address:port"))
    assert(global("hosts = a=1.2.3.4:http\ndomain.d = /x\n")
      .contains("non-numeric"))
    assert(global("hosts = a\nport = x\ndomain.d = /x\n").contains("integer"))
  }

  test("local: defaults mirror the reference; guards enforced") {
    val l = ServeConfig.readLocal(
      write("l.conf", "local.root = /data/graft\n"), conf)
    assert(l.updateIntervalS === 60) // reference DEFAULT-LOCAL-CONFIG
    assert(l.downloadRateLimitKbps === None)
    assert(l.cleanupKeep === 0)
    assert(l.httpPort === None)
    val full = ServeConfig.readLocal(
      write("l.conf",
        """local.root = /d
          |update.interval.s = 5
          |download.rate.limit.kbps = 1024
          |cleanup.keep = 3
          |http.port = 8080
          |""".stripMargin), conf)
    assert(full === ServeConfig.Local("/d", 5, Some(1024), 3, Some(8080)))
    def local(body: String) =
      intercept[IllegalArgumentException](
        ServeConfig.readLocal(write("l.conf", body), conf)).getMessage
    assert(local("update.interval.s = 5\n").contains("local.root"))
    assert(local("local.root = /d\ncleanup.keep = 1\n").contains("cleanup.keep"))
    assert(local("local.root = /d\nupdate.interval.s = 0\n")
      .contains("update.interval.s"))
    assert(local("local.root = /d\ndownload.rate.limit.kbps = 0\n")
      .contains("download.rate.limit.kbps"))
  }

  test("local: fs.* entries ride into a COPIED Hadoop Configuration (reference :hdfs-conf)") {
    val l = ServeConfig.readLocal(
      write("l.conf",
        """local.root = /d
          |fs.graft.test.key = hello
          |fs.defaultFS = file:///
          |""".stripMargin), conf)
    assert(l.fsConf === Map("fs.graft.test.key" -> "hello", "fs.defaultFS" -> "file:///"))
    val base = new Configuration(false)
    val applied = l.hadoopConf(base)
    assert(applied.get("fs.graft.test.key") === "hello")
    assert(base.get("fs.graft.test.key") === null, "base Configuration was mutated")
    // no fs.* entries -> an equivalent copy
    val none = ServeConfig.readLocal(write("l.conf", "local.root = /d\n"), conf)
    assert(none.fsConf.isEmpty)
  }
}
