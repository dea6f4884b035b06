package graft

import java.net.{HttpURLConnection, URI}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.functions._
import graft.store.DomainStore

/**
 * The HTTP dashboard ([[HttpDashboard]], wired through [[Serve]]): the
 * reference's web UI surface (domain list + per-domain pages) as a
 * Spark-free read-only endpoint on the serving daemon.
 */
class HttpDashboardSpec extends SparkSuite {

  private def fetch(url: String): (Int, String) = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(10000)
    try {
      val code = conn.getResponseCode
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body =
        if (in == null) ""
        else try new String(in.readAllBytes(), "UTF-8") finally in.close()
      (code, body)
    } finally conn.disconnect()
  }

  test("dashboard: overview, per-domain pages, status.json, healthz") {
    import spark.implicits._
    val conf = new Configuration()
    val dbRoot = scratch("dash-db")
    def kv(pairs: Seq[(String, String)]) =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))

    val users = DomainStore.create(
      s"$dbRoot/users", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    users.write(kv(Seq("u1" -> "ada", "u2" -> "grace", "u3" -> "edsger")), 1L)
    val docs = DomainStore.create(
      s"$dbRoot/docs", DomainSpec(2, persistenceFormat = DomainSpec.KvSortedZ), conf)
    docs.write(kv(Seq("d1" -> "text")), 1L)

    val handle = Serve.start(
      dbRoot, conf, refreshMillis = 100L, log = _ => (), httpPort = Some(0))
    try {
      val port = handle.dashboardPort.get
      val base = s"http://127.0.0.1:$port"

      // overview lists both domains as ready, links their pages
      val (code, html) = fetch(s"$base/")
      assert(code === 200)
      assert(html.contains("/domain/users") && html.contains("/domain/docs"))
      assert(html.contains("fully loaded"), html)

      // machine-readable census: same content the socket STATUS op serves
      val (jc, json) = fetch(s"$base/status.json")
      assert(jc === 200)
      assert(json.contains(s""""lookup_port":${handle.boundPort}"""))
      assert(json.contains(""""fully_loaded":true"""))
      assert(json.contains(""""name":"users","status":"ready","served_version":1"""))

      // healthz: ready = 200
      assert(fetch(s"$base/healthz") === ((200, "ok\n")))

      // metrics: the socket server's counters ride the dashboard too —
      // drive one lookup over the wire, then expect its counter
      val probe = new graft.store.RemoteKvReader("127.0.0.1", handle.boundPort, "users")
      try probe.get("u1".getBytes("UTF-8")) finally probe.close()
      val (mc, mjson) = fetch(s"$base/metrics.json")
      assert(mc === 200)
      assert(mjson.contains("\"multi_get.requests\":"), mjson)
      assert(mjson.contains("\"connections.accepted\":"), mjson)

      // per-domain page: spec + shard table with the real pair total
      val (dc, dhtml) = fetch(s"$base/domain/users")
      assert(dc === 200)
      assert(dhtml.contains("4 shards"), dhtml)
      assert(dhtml.contains("3 pairs hosted"), dhtml)
      val (djc, djson) = fetch(s"$base/domain/users.json")
      assert(djc === 200)
      assert(djson.contains(""""total_pairs":3"""))
      assert(djson.contains(""""num_shards":4"""))
      assert(djson.contains(""""format":"kv-sorted""""))

      // unknown domain and unknown path 404; non-GET 405
      assert(fetch(s"$base/domain/nope")._1 === 404)
      assert(fetch(s"$base/bogus")._1 === 404)
      val post = new URI(s"$base/").toURL.openConnection().asInstanceOf[HttpURLConnection]
      post.setRequestMethod("POST"); post.setDoOutput(true)
      post.getOutputStream.write("x".getBytes)
      assert(post.getResponseCode === 405)
      post.disconnect()

      // a publish observed by the updater shows up on the next poll
      users.write(kv(Seq("u1" -> "ada lovelace")), 2L)
      val deadline = System.nanoTime() + 15e9.toLong
      var v2 = false
      while (!v2 && System.nanoTime() < deadline) {
        v2 = fetch(s"$base/status.json")._2
          .contains(""""name":"users","status":"ready","served_version":2""")
        if (!v2) Thread.sleep(50)
      }
      assert(v2, "dashboard never showed the hot-swapped version")
    } finally handle.close()

    // after close the port answers nothing
    intercept[java.io.IOException] {
      fetch(s"http://127.0.0.1:${handle.dashboardPort.get}/healthz")
    }
  }

  test("metrics history: ?window= serves bounded in-daemon samples with rate-of-change") {
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    val dash = HttpDashboard.start(
      0, () => Nil, () => Map.empty, () => 0,
      metrics = () => Seq("ticks" -> counter.incrementAndGet()),
      sampleIntervalMs = 50L)
    try {
      val base = s"http://127.0.0.1:${dash.boundPort}"
      // bare endpoint: unchanged snapshot shape
      val (bc, bare) = fetch(s"$base/metrics.json")
      assert(bc === 200 && bare.startsWith("""{"ticks":"""), bare)

      // the sampler fills the ring; wait for >= 3 samples in the window
      val deadline = System.nanoTime() + 15e9.toLong
      var body = ""
      var ts = 0
      while (ts < 3 && System.nanoTime() < deadline) {
        body = fetch(s"$base/metrics.json?window=60")._2
        ts = "\"ts\":".r.findAllIn(body).length
        if (ts < 3) Thread.sleep(50)
      }
      assert(ts >= 3, s"sampler never produced 3 samples: $body")
      assert(body.contains(""""now":{"ticks":"""), body)
      assert(body.contains(""""interval_ms":50"""), body)
      // rate-of-change is visible: the SAMPLED counter values increase
      // in sample order (the "now" field precedes the samples — exclude it)
      val sampleSection = body.substring(body.indexOf("\"samples\":"))
      val vals = """"ticks":(\d+)""".r.findAllMatchIn(sampleSection)
        .map(_.group(1).toLong).toSeq
      assert(vals.distinct.size >= 3, s"samples show no movement: $vals")
      assert(vals === vals.sorted, s"monotonic counter sampled out of order: $vals")

      // invalid windows answer 400, not 500
      assert(fetch(s"$base/metrics.json?window=0")._1 === 400)
      assert(fetch(s"$base/metrics.json?window=-5")._1 === 400)
      assert(fetch(s"$base/metrics.json?window=abc")._1 === 400)
    } finally dash.close()
  }
}
