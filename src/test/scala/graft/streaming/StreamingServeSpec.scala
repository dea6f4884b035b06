package graft.streaming

import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

import graft.SparkSuite
import graft.core.DomainSpec
import graft.functions._
import graft.store.{DomainStore, KvDomainReader, RamFileSystem}

/**
 * The reference's complete updater-daemon cycle (V9: its updater
 * downloaded each new version and swapped the serving domain,
 * `elephantdb-server/src/clj/elephantdb/common/domain.clj:208-228`),
 * end-to-end in this engine's terms: [[StreamingDomain.upsertStream]]
 * publishes one version per micro-batch (copy-forward, token-gated) while
 * a root-opened [[KvDomainReader]] FOLLOWS the domain via `refresh()` —
 * concurrently with the ingest, under a get-hammer. What must hold:
 *
 *  - the follower's `servedVersion` is MONOTONICALLY non-decreasing and
 *    ends at the newest publish;
 *  - every get, at every instant of the run, is answered from a COMPLETE
 *    published version (old value or new value, never a torn mix, never
 *    a failure, never a miss for a key every version holds).
 */
class StreamingServeSpec extends SparkSuite {

  private val auth = "streamserve"
  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("streaming ingest → serving follower: refresh() tracks each publish, every get from a complete version") {
    import spark.implicits._
    RamFileSystem.clear(auth)
    val conf = new Configuration()
    val srcDir = scratch("streamserve-src")
    val ckpt = scratch("streamserve-ckpt")
    val fs = new org.apache.hadoop.fs.Path(srcDir).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(srcDir))

    val store = DomainStore.create(
      s"ramfs://$auth/dom", DomainSpec(8, persistenceFormat = DomainSpec.KvSorted), conf)

    val nBatches = 5
    val keys = (0 until 60).map(i => f"sk$i%03d")
    // batch 0 bootstraps every key at "v1-"; batch b (1..) rewrites the
    // keys it owns (i % nBatches == b) to "v{b+1}-". Each key thus has a
    // KNOWN legal value set at any instant: v1, plus its single rewrite
    // once that version is published — anything else is a torn read.
    def batchPairs(b: Int): Seq[(String, String)] =
      if (b == 0) keys.map(k => k -> s"v1-$k")
      else keys.zipWithIndex.collect {
        case (k, i) if i % nBatches == b => k -> s"v${b + 1}-$k"
      }
    def legalValues(k: String): Set[String] = {
      val i = keys.indexOf(k)
      val owner = i % nBatches
      if (owner == 0) Set(s"v1-$k") else Set(s"v1-$k", s"v${owner + 1}-$k")
    }

    val kvSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    def kvParquet(name: String, pairs: Seq[(String, String)]): Unit =
      pairs.toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$srcDir/$name")

    // ---- bootstrap: first micro-batch published, follower opens on it
    kvParquet("d0", batchPairs(0))
    locally {
      val q = StreamingDomain.upsertStream(
        store,
        spark.readStream.schema(kvSchema).parquet(s"$srcDir/*"),
        baseVersion = 0L, queryName = "serve_stream_boot", checkpointDir = ckpt)
      try q.awaitTermination() finally q.stop()
    }
    assert(store.latestVersion === 1L)

    val reader = KvDomainReader.open(s"ramfs://$auth/dom", conf)
    try {
      assert(reader.servedVersion === 1L)

      // ---- the daemon cycle: follower thread refreshes + hammers gets
      // while the ingest publishes versions 2..nBatches concurrently
      val stop = new AtomicBoolean(false)
      val violation = new AtomicReference[String](null)
      val maxSeen = new java.util.concurrent.atomic.AtomicLong(1L)
      val follower = new Thread(() => {
        val rnd = new scala.util.Random(7)
        var lastVersion = reader.servedVersion
        while (!stop.get() && violation.get() == null) {
          try {
            reader.refresh()
            val v = reader.servedVersion
            if (v < lastVersion) violation.compareAndSet(null,
              s"servedVersion went BACKWARD: $lastVersion -> $v")
            lastVersion = v
            maxSeen.updateAndGet(m => math.max(m, v))
            (0 until 25).foreach { _ =>
              val k = keys(rnd.nextInt(keys.length))
              val got = reader.get(utf8(k)).map(new String(_, "UTF-8"))
              if (got.isEmpty || !legalValues(k).contains(got.get))
                violation.compareAndSet(null,
                  s"key $k answered $got at servedVersion $v — not a value " +
                    s"from any complete version (legal: ${legalValues(k)})")
            }
          } catch {
            case e: Exception =>
              violation.compareAndSet(null, s"follower failed mid-cycle: $e")
          }
        }
      })
      follower.setDaemon(true)
      follower.start()

      (1 until nBatches).foreach(b => kvParquet(s"d$b", batchPairs(b)))
      locally {
        // maxFilesPerTrigger=1 → one micro-batch (one publish) per file,
        // all inside a single AvailableNow run — versions land while the
        // follower is mid-hammer, exactly the daemon's steady state
        val q = StreamingDomain.upsertStream(
          store,
          spark.readStream.schema(kvSchema)
            .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*"),
          baseVersion = 0L, queryName = "serve_stream_follow", checkpointDir = ckpt)
        try q.awaitTermination() finally q.stop()
      }
      assert(store.latestVersion === nBatches.toLong)

      // let the follower observe the final publish, then stop it
      val deadline = System.nanoTime() + 10e9.toLong
      while (maxSeen.get() < nBatches && violation.get() == null &&
        System.nanoTime() < deadline) Thread.sleep(20)
      stop.set(true)
      follower.join(10000)
      assert(violation.get() === null, Option(violation.get()).getOrElse("ok"))
      assert(maxSeen.get() === nBatches.toLong,
        s"follower never observed the final publish (saw ${maxSeen.get()})")

      // ---- steady state: newest version everywhere, refresh is a no-op
      assert(!reader.refresh())
      assert(reader.servedVersion === nBatches.toLong)
      keys.zipWithIndex.foreach { case (k, i) =>
        val owner = i % nBatches
        val want = if (owner == 0) s"v1-$k" else s"v${owner + 1}-$k"
        assert(reader.get(utf8(k)).map(new String(_, "UTF-8")) === Some(want), k)
      }
      assert(reader.count() === keys.size.toLong)
    } finally reader.close()
  }
}
