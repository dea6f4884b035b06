package graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.store.{DomainStore, KvDomainReader}

/** The README "Quick start" section, verbatim — if this compiles and
  * passes, the documented first-contact experience works. Keep the two
  * in sync. */
class QuickStartSpec extends SparkSuite {

  test("README quick start: build a domain, look up keys, dedupe a corpus") {
    import spark.implicits._

    // --- build a versioned, sharded KV domain and point-look-up from it
    val users = Seq(1L -> "ada", 2L -> "grace", 3L -> "edsger")
      .toDF("id", "name")
      .select(long_be(col("id")).as("key"), utf8_bytes(col("name")).as("value"))
    val store = DomainStore.create(
      scratch("quickstart-domain"), DomainSpec(numShards = 4), new Configuration())
    store.write(users, version = 1L)

    val name = store.get(spark, longBe(2L)).map(new String(_, "UTF-8"))
    assert(name === Some("grace"))

    // plain `key = X` filters prune to the routed shard automatically
    // (ShardPruningRule) — no shard arithmetic in user code
    val viaSql = store.read(spark)
      .where(col("key") === lit(longBe(3L)))
      .select(bytes_utf8(col("value")))
      .collect().map(_.getString(0))
    assert(viaSql.toSeq === Seq("edsger"))

    // --- dedupe a document corpus: MinHash-LSH candidates, exact verify,
    // connected-components representative per near-dup cluster
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",   // exact dup
      3L -> "an entirely different document about spark").toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(corpus, "doc_id", "text", threshold = 0.8)
    val reps = Dedup.components(corpus.select(col("doc_id").as("id")), pairs)
      .where(col("id") === col("rep_id")).select(col("id"))
    assert(reps.collect().map(_.getLong(0)).toSet === Set(1L, 3L))

    // --- score text quality and search embeddings
    val quality = TextAnalysis.qualityReport(corpus, "doc_id", "text")
    assert(quality.where(col("ws_tokens") >= 5).count() === 3)

    val vectors = Seq(
      1L -> Array(1.0, 0.0), 2L -> Array(0.9, 0.1), 3L -> Array(0.0, 1.0))
      .toDF("vec_id", "embedding")
    val nn = Similarity.bruteForceTopK(
      vectors, vectors.where(col("vec_id") === 1L), "vec_id", "embedding", k = 1)
    assert(nn.select("neighbor_id").collect().map(_.getLong(0)).toSeq === Seq(2L))

    // --- export for SERVING: kv-sorted shard files a non-Spark process
    // binary-searches (route -> bloom probe -> O(log n) seeks)
    val servedRoot = scratch("quickstart-served")
    val served = DomainStore.create(
      servedRoot,
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    served.write(users, version = 1L)
    val reader = KvDomainReader.open(servedRoot, new Configuration()) // zero Spark
    try {
      assert(reader.get(longBe(2L)).map(new String(_, "UTF-8")) === Some("grace"))
      // the daemon's batch RPC: density-adaptive per shard
      assert(reader.multiGet(Seq(longBe(1L), longBe(9L), longBe(3L)))
        .map(_.map(new String(_, "UTF-8")))
        === IndexedSeq(Some("ada"), None, Some("edsger")))
    } finally reader.close()

    // --- two same-sharded kv domains join with ZERO shuffle and ZERO
    // sort (storage-partitioned join: the scans report the layout), and
    // fsck audits a version's integrity in one linear pass
    val counts = DomainStore.create(
      scratch("quickstart-counts"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    counts.write(
      Seq(1L -> "12", 3L -> "7").toDF("id", "n")
        .select(long_be(col("id")).as("key"), utf8_bytes(col("n")).as("value")),
      version = 1L)
    val joined = served.readPartitioned(spark).as("u")
      .join(counts.readPartitioned(spark).as("c"), Seq("shard", "key"))
      .select(be_long(col("key")).as("id"),
        bytes_utf8(col("u.value")).as("name"), bytes_utf8(col("c.value")).as("n"))
    assert(joined.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      === Set((1L, "ada", "12"), (3L, "edsger", "7")))
    assert(served.fsck(spark).select(sum(col("n_misrouted"))).head.getLong(0) === 0L)
  }

  test("README quick start: compressed engine, migration, phrase search, chunking") {
    import spark.implicits._
    import graft.operators.Search
    import graft.store.PhraseReader

    val docs = Seq(
      1L -> "spark streams merge fast tables",
      2L -> "the cat sat on the mat",
      3L -> "a cat sat where the cat sat before").toDF("doc_id", "text")
    val asKv = docs.select(
      long_be(col("doc_id")).as("key"), utf8_bytes(col("text")).as("value"))

    // --- the block-compressed servable engine: same API, Deflate blocks
    val zRoot = scratch("quickstart-z")
    val z = DomainStore.create(
      zRoot, DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSortedZ),
      new Configuration())
    z.write(asKv, version = 1L)
    val zReader = KvDomainReader.open(zRoot, new Configuration()) // zero Spark
    try assert(zReader.get(longBe(2L)).map(new String(_, "UTF-8"))
      === Some("the cat sat on the mat"))
    finally zReader.close()

    // --- migrate an existing domain between engines WITHOUT reshuffling
    val plainRoot = scratch("quickstart-plain")
    val plain = DomainStore.create(
      plainRoot, DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    plain.write(asKv, version = 1L)
    val migrated = DomainStore.transcode(
      spark, plainRoot, scratch("quickstart-migrated"), DomainSpec.KvSortedZ,
      version = 1L, new Configuration())
    assert(migrated.count(spark) === 3L)

    // --- phrase search: publish a positional index, query it, serve it
    val posRoot = scratch("quickstart-pos")
    val pos = DomainStore.create(
      posRoot, DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSortedZ),
      new Configuration())
    pos.write(Search.positionalIndexKv(docs, "doc_id", "text"), version = 1L)
    val hits = Search.phraseSearch(
      pos, Seq(0L -> "cat sat").toDF("query_id", "phrase"), k = 5)
    assert(hits.orderBy("rank").select("doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(3L, 2L)) // 2 occurrences beat 1
    val phrases = new PhraseReader(
      KvDomainReader.open(posRoot, new Configuration())) // zero Spark
    try assert(phrases.phrase("cat sat", 5) === Seq(3L -> 2L, 2L -> 1L))
    finally phrases.close()

    // --- cut documents into RAG-ready overlapping chunks
    val chunks = TextAnalysis.chunkDocuments(
      docs, "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
    assert(chunks.where(col("doc_id") === 2).count() === 2) // 6 tokens -> 2 windows

    // --- ranked phrase retrieval: the phrase constrains, BM25 orders
    val ranked = Search.phraseSearchRanked(
      pos, Seq(0L -> "cat sat").toDF("query_id", "phrase"), k = 5)
    assert(ranked.select("doc_id").collect().map(_.getLong(0)).toSet === Set(2L, 3L))
  }

  test("README quick start: multi-host serving ring with failover and hot-swap") {
    import spark.implicits._
    import graft.store.{RingClient, ShardRing}
    import org.apache.hadoop.fs.Path

    // own catalog dir: Status.report scans every domain under a root, and
    // the shared test-scratch parent holds other suites' fixtures
    val dbRoot = scratch("quickstart-ringdb")
    val root = s"$dbRoot/users"
    val store = DomainStore.create(
      root, DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    store.write(
      (0 until 100).map(i => s"u$i" -> s"name-$i").toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
      version = 1L)

    // deal the shards over 2 hosts with replication 2, pull each host's
    // subset (optionally bandwidth-capped), and serve it Spark-free
    val ring = ShardRing.generateIndex(Seq("host-a", "host-b"), 4, replication = 2)
    val readers = Seq("host-a", "host-b").map { h =>
      val dest = new Path(scratch(s"quickstart-ring-$h"))
      store.localizeForHost(1L, dest, ring, h)
      h -> KvDomainReader.localized(
        dest.toString, store.spec, new Configuration(), Some(ring.shardSet(h)))
    }.toMap
    val client = new RingClient(ring, readers)
    try {
      assert(client.get("u42".getBytes("UTF-8"))
        .map(new String(_, "UTF-8")) === Some("name-42"))
      readers("host-a").close() // one replica dies: reads fail over
      assert(client.get("u42".getBytes("UTF-8")).isDefined)
    } finally client.close()

    // a root-opened reader follows new publishes WITHOUT dropping reads
    val follower = KvDomainReader.open(root, new Configuration())
    try {
      assert(follower.servedVersion === 1L)
      store.write(
        Seq("u1" -> "renamed").toDF("k", "v")
          .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
        version = 2L)
      assert(follower.refresh() === true) // hot-swap: in-flight gets never torn
      assert(follower.get("u1".getBytes("UTF-8"))
        .map(new String(_, "UTF-8")) === Some("renamed"))
    } finally follower.close()

    // the one-call ops dashboard over the database root
    val report = Status.report(spark, dbRoot, new Configuration())
    assert(report.where(col("status") === "ready").count() >= 1)
  }

  test("README quick start: cross-process serving through KvServer + RemoteKvReader") {
    import spark.implicits._
    import graft.store.{KvServer, RemoteKvReader, RingClient, ShardRing}

    val conf = new Configuration()
    val store = DomainStore.create(
      scratch("quickstart-rpc-dom"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted), conf)
    store.write(
      (0 until 50).map(i => s"u$i" -> s"name-$i").toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
      version = 1L)

    // serving box: a KvServer over its local reader(s)
    val localReader = KvDomainReader.open(store.root.toString, conf)
    val server = new KvServer(Map("users" -> localReader))
    // client box: a stub per host; the ring semantics carry over unchanged
    val stub = new RemoteKvReader("127.0.0.1", server.boundPort, "users")
    val ring = ShardRing.generateIndex(Seq("host-a"), 4, replication = 1)
    val client = new RingClient(ring, Map("host-a" -> stub))
    try {
      assert(client.get("u7".getBytes("UTF-8"))
        .map(new String(_, "UTF-8")) === Some("name-7"))
      // the reference's update RPC: publish v2, hot-swap server-side
      store.write(
        Seq("u7" -> "renamed").toDF("k", "v")
          .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
        version = 2L)
      assert(stub.refresh() === true)
      assert(stub.servedVersion === 2L)
      assert(client.get("u7".getBytes("UTF-8"))
        .map(new String(_, "UTF-8")) === Some("renamed"))
    } finally {
      client.close(); server.close(); localReader.close()
    }
  }

  test("README quick start: streaming ingest feeds a hot-swapping serving reader") {
    import spark.implicits._
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    import graft.streaming.StreamingDomain

    val srcDir = scratch("quickstart-stream-src")
    val conf = new Configuration()
    new org.apache.hadoop.fs.Path(srcDir).getFileSystem(conf)
      .mkdirs(new org.apache.hadoop.fs.Path(srcDir))
    Seq("u1" -> "ada").toDF("k", "v")
      .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
      .coalesce(1).write.parquet(s"$srcDir/batch0")
    val store = DomainStore.create(
      scratch("quickstart-stream-dom"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted), conf)
    val kvSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    val ckpt = scratch("quickstart-stream-ckpt")

    // STREAMING ingest → versioned publishes: each micro-batch becomes one
    // copy-forward upsert publish (version = baseVersion + batchId + 1);
    // a crash mid-batch leaves the previous version serving, a replayed
    // batch is a no-op — the reference's updater cycle as one writeStream
    def drain(): Unit = {
      val q = StreamingDomain.upsertStream(
        store, spark.readStream.schema(kvSchema).parquet(s"$srcDir/*"),
        baseVersion = 0L, queryName = "quickstart_ingest",
        checkpointDir = ckpt)
      try q.awaitTermination() finally q.stop()
    }
    drain()

    // ...while a serving reader FOLLOWS the publishes via refresh():
    // servedVersion only moves forward, in-flight gets are never torn
    val reader = KvDomainReader.open(store.root.toString, conf)
    try {
      assert(reader.servedVersion === 1L)
      assert(reader.get("u1".getBytes("UTF-8"))
        .map(new String(_, "UTF-8")) === Some("ada"))
      Seq("u1" -> "ada lovelace", "u2" -> "grace").toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value"))
        .coalesce(1).write.parquet(s"$srcDir/batch1")
      drain()                               // next micro-batch → version 2
      assert(reader.refresh() === true)     // the follower hot-swaps to it
      assert(reader.servedVersion === 2L)
      assert(reader.get("u2".getBytes("UTF-8"))
        .map(new String(_, "UTF-8")) === Some("grace"))
    } finally reader.close()
  }

  private def longBe(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()
}
