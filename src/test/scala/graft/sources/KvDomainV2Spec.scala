package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.DomainSpec
import graft.store.DomainStore

class KvDomainV2Spec extends SparkSuite {

  private def buildDomain(name: String, shards: Int, rows: Seq[(Long, String)]): DomainStore = {
    import spark.implicits._
    val store = DomainStore.create(
      scratch(s"kvv2/$name"), DomainSpec(numShards = shards, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    val df = rows.toDF("k", "v").select(
      graft.functions.long_be(col("k")).as("key"),
      graft.functions.utf8_bytes(col("v")).as("value"))
    store.write(df, version = 1L)
    store
  }

  test("links registry: a same-id delete+rebuild is a registry miss (token-mtime stamp)") {
    import spark.implicits._
    val conf = new Configuration()
    val store = DomainStore.create(
      scratch("kvv2/links-stamp"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted), conf)
    def kv(pairs: (Long, String)*) = pairs.toDF("k", "v").select(
      graft.functions.long_be(col("k")).as("key"),
      graft.functions.utf8_bytes(col("v")).as("value"))
    // DIRECT DSv2 reads: unlike readPartitioned (which re-registers the
    // resolved links on every call, masking the hole), a direct
    // spark.read / catalog read resolves links from the JVM-GLOBAL
    // registry alone — the path where a stale memoized map silently
    // serves the pre-rebuild rows
    def pairsAt(v: Long): Set[(Long, String)] =
      spark.read
        .format(classOf[graft.sources.KvDomainTableProvider].getName)
        .option("path", store.versions.versionPath(v).toString)
        .option("shards", "4")
        .load()
        .select(graft.functions.be_long(col("key")), graft.functions.bytes_utf8(col("value")))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    store.write(kv(1L -> "one", 2L -> "two"), 1L)
    // a LINKED upsert; the direct read memoizes v2's link map into the
    // JVM-global registry
    store.upsert(spark, kv(1L -> "one-b"), 2L, linked = true)
    assert(pairsAt(2L) === Set(1L -> "one-b", 2L -> "two"))
    // delete + rebuild v2 as a FULL build (token re-created): the next
    // direct read must plan against the new physical dirs — the old
    // memoized links (pointing shards at v1) must read as a registry
    // MISS via the token-mtime stamp, or this scan silently serves the
    // pre-rebuild rows from v1's still-retained dirs
    store.versions.deleteVersion(2L)
    store.write(kv(9L -> "nine"), 2L)
    assert(pairsAt(2L) === Set(9L -> "nine"),
      "stale link map served the pre-rebuild version")
  }

  // AQE hides exchanges inside QueryStageExec nodes, which collect() does
  // not descend into — inspect the FINAL adaptive plan's rendering (the
  // part before "== Initial Plan =="), where every stage's subtree shows.
  private def finalPlan(df: DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }
  private def shuffleCount(df: DataFrame): Int =
    "Exchange ".r.findAllIn(finalPlan(df)).length
  private def sortCount(df: DataFrame): Int =
    "Sort \\[".r.findAllIn(finalPlan(df)).length

  /** Test domains are tiny, so the scan statistics (working as intended)
    * make the planner broadcast them; disable broadcast to face it with
    * the choice a corpus-scale domain poses. */
  private def withNoBroadcast[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      keys.foreach(spark.conf.set(_, "-1"))
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("storage-partitioned join of two same-sharded kv domains: no shuffle, no sort") {
    val a = buildDomain("spj-a", 4, (0L until 1000L).filter(_ % 2 == 0).map(i => i -> s"a$i"))
    val b = buildDomain("spj-b", 4, (0L until 1000L).filter(_ % 3 == 0).map(i => i -> s"b$i"))

    withNoBroadcast {
      val joined = a.readPartitioned(spark).as("a")
        .join(b.readPartitioned(spark).as("b"), Seq("shard", "key"))
        .select(
          graft.functions.be_long(col("key")).as("k"),
          graft.functions.bytes_utf8(col("a.value")).as("av"),
          graft.functions.bytes_utf8(col("b.value")).as("bv"))

      val got = joined.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      val want = (0L until 1000L).filter(i => i % 6 == 0).map(i => (i, s"a$i", s"b$i"))
      assert(got.toSeq === want)

      // The SPJ contract itself: co-partitioned merge join straight off
      // the shard files — no exchange, no sort, on either side.
      assert(shuffleCount(joined) === 0, finalPlan(joined))
      assert(sortCount(joined) === 0, finalPlan(joined))
    }
  }

  test("probe-vs-domain join shuffles and sorts ONLY the probe side") {
    import spark.implicits._
    val dom = buildDomain("oneside", 4, (0L until 1000L).map(i => i -> s"v$i"))
    val probe = (0L until 1000L by 7).toDF("k")
      .select(graft.functions.long_be(col("k")).as("key"))
      .withColumn("shard", graft.functions.shard_index(col("key"), 4))
    // a REAL jumbo probe exceeds the broadcast threshold; disabling
    // broadcast poses the genuine choice (shuffle both vs just the probe)
    withNoBroadcast {
      val joined = dom.readPartitioned(spark).join(probe, Seq("shard", "key"))
        .select(graft.functions.be_long(col("key")).as("k"),
          graft.functions.bytes_utf8(col("value")).as("v"))
      val got = joined.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got.toSeq === (0L until 1000L by 7).map(i => (i, s"v$i")))
      // one exchange (the probe shuffled into the domain's reported
      // partitioning), at most one sort (the probe side); the domain
      // side never re-partitions
      assert(shuffleCount(joined) === 1, finalPlan(joined))
      assert(finalPlan(joined).contains("Exchange keygroupedpartitioning"), finalPlan(joined))
      assert(sortCount(joined) <= 1, finalPlan(joined))
    }
  }

  test("SPJ with mostly-EMPTY shards: partition values still align, no shuffle") {
    // 2 keys into 8 shards: most shard dirs never exist on disk, but the
    // source still plans one partition per shard so both sides' partition
    // values match exactly
    val a = buildDomain("sparse-a", 8, Seq(1L -> "a1", 2L -> "a2"))
    val b = buildDomain("sparse-b", 8, Seq(2L -> "b2", 3L -> "b3"))
    withNoBroadcast {
      val joined = a.readPartitioned(spark).as("a")
        .join(b.readPartitioned(spark).as("b"), Seq("shard", "key"))
        .select(graft.functions.be_long(col("key")).as("k"),
          graft.functions.bytes_utf8(col("a.value")).as("av"),
          graft.functions.bytes_utf8(col("b.value")).as("bv"))
      val got = joined.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(got.toSeq === Seq((2L, "a2", "b2")))
      assert(shuffleCount(joined) === 0, finalPlan(joined))
    }
  }

  test("plain scan through the v2 source equals the flatMap scan") {
    val a = buildDomain("scan-eq", 3, (0L until 500L).map(i => i -> s"v$i"))
    val v2 = a.readPartitioned(spark).select("key", "value", "shard").collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getAs[Array[Byte]](1).toSeq, r.getInt(2)))
    val v1 = a.read(spark).select("key", "value", "shard").collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getAs[Array[Byte]](1).toSeq, r.getInt(2)))
    assert(v2.sortBy(_.toString).toSeq === v1.sortBy(_.toString).toSeq)
  }

  test("shard-equality filters prune input partitions; column pruning reaches the reader") {
    val a = buildDomain("prune", 4, (0L until 400L).map(i => i -> s"v$i"))
    val one = a.readPartitioned(spark).where(col("shard") === 2)
    // partition pruning is visible in the scan description (shards=1/4)
    assert(one.queryExecution.executedPlan.toString.contains("shards=1/4"),
      one.queryExecution.executedPlan.toString)
    val viaScan = a.read(spark).where(col("shard") === 2).count()
    assert(one.count() === viaScan)

    // keys-only projection: the pruned read schema drops `value`
    val keysOnly = a.readPartitioned(spark).select("shard", "key")
    assert(keysOnly.queryExecution.executedPlan.toString.contains("cols=[shard,key]")
      || keysOnly.queryExecution.executedPlan.toString.contains("cols=[key,shard]"),
      keysOnly.queryExecution.executedPlan.toString)
    assert(keysOnly.count() === 400L)
  }

  test("the DSv2 surface works unchanged on a COMPRESSED domain: SPJ, pruning, agg pushdown") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => i -> (s"payload $i " * 10))
    val store = DomainStore.create(
      scratch("kvv2/z-a"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSortedZ),
      new Configuration())
    store.write(rows.toDF("k", "v").select(
      graft.functions.long_be(col("k")).as("key"),
      graft.functions.utf8_bytes(col("v")).as("value")), version = 1L)
    // trailer-count + min/max aggregate pushdown ride the sniffed readers
    val agg = store.readPartitioned(spark)
      .groupBy("shard").agg(count(lit(1)).as("n"), min("key").as("lo"))
    assert(finalPlan(agg).contains("kvdomain-agg"), finalPlan(agg))
    assert(agg.agg(sum("n")).collect()(0).getLong(0) === 400L)
    // partition pruning + SPJ against a PLAIN kv domain of the same scheme
    val plain = buildDomain("z-b", 4, rows.map { case (k, v) => k -> s"p$k" })
    val one = store.readPartitioned(spark).where(col("shard") === 1)
    assert(one.queryExecution.executedPlan.toString.contains("shards=1/4"))
    withNoBroadcast {
      val joined = store.readPartitioned(spark).as("a")
        .join(plain.readPartitioned(spark).as("b"), Seq("shard", "key"))
        .select(graft.functions.be_long(col("key")).as("k"))
      assert(joined.count() === 400L)
      assert(shuffleCount(joined) === 0, finalPlan(joined))
    }
  }

  test("count(*) pushes down to the kv trailers: no data bytes, exact answer") {
    val a = buildDomain("agg-count", 4, (0L until 700L).map(i => i -> s"v$i"))
    val df = a.readPartitioned(spark).groupBy().count()
    assert(finalPlan(df).contains("kvdomain-agg"), finalPlan(df))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(700L))
    // df.count() compiles to the same pushed shape
    assert(a.readPartitioned(spark).count() === 700L)
  }

  test("min/max(key) + count grouped by shard push down; values match the scan") {
    val a = buildDomain("agg-minmax", 4, (0L until 300L).map(i => i -> s"v$i"))
    val pushed = a.readPartitioned(spark)
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), min("key").as("lo"), max("key").as("hi"))
    assert(finalPlan(pushed).contains("kvdomain-agg"), finalPlan(pushed))
    def render(df: DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq, r.getAs[Array[Byte]](3).toSeq))
      .sortBy(_._1).toSeq
    val viaScan = a.read(spark)
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), min("key").as("lo"), max("key").as("hi"))
    assert(render(pushed) === render(viaScan))

    // global (ungrouped) min/max too
    val g = a.readPartitioned(spark).agg(min("key"), max("key"), count(lit(1)))
    assert(finalPlan(g).contains("kvdomain-agg"), finalPlan(g))
    val row = g.collect()(0)
    assert(row.getAs[Array[Byte]](0).toSeq === graft.store.VectorCodec.longBe(0L).toSeq)
    assert(row.getAs[Array[Byte]](1).toSeq === graft.store.VectorCodec.longBe(299L).toSeq)
    assert(row.getLong(2) === 300L)
  }

  test("a filtered aggregate does NOT push down and stays correct") {
    val a = buildDomain("agg-filtered", 4, (0L until 200L).map(i => i -> s"v$i"))
    val df = a.readPartitioned(spark).where(col("shard") === 1).groupBy().count()
    assert(!finalPlan(df).contains("kvdomain-agg"), finalPlan(df))
    assert(df.collect()(0).getLong(0) ===
      a.read(spark).where(col("shard") === 1).count())
  }

  test("ORDER BY key LIMIT n pushes a per-shard stop; plain LIMIT too") {
    val a = buildDomain("topn", 4, (0L until 500L).map(i => i -> s"v$i"))
    val top = a.readPartitioned(spark).orderBy("key").limit(7)
      .select(graft.functions.be_long(col("key")).as("k"))
    assert(finalPlan(top).contains("limit=7"), finalPlan(top))
    assert(top.collect().map(_.getLong(0)).toSeq === (0L until 7L).toSeq)

    val lim = a.readPartitioned(spark).limit(9)
    assert(finalPlan(lim).contains("limit=9"), finalPlan(lim))
    assert(lim.count() === 9L)
  }

  test("key-range filters push into the scan: pruned I/O, same answers as the residual filter") {
    val a = buildDomain("range", 4, (0L until 1000L).map(i => i -> s"v$i"))
    def be(l: Long): Array[Byte] = java.nio.ByteBuffer.allocate(8).putLong(l).array()

    // non-negative longs big-endian: unsigned byte order == numeric order
    val pushed = a.readPartitioned(spark)
      .where(col("key") >= lit(be(100L)) && col("key") < lit(be(200L)))
    // the pushed range is visible in the scan description
    assert(finalPlan(pushed).contains("keyRange="), finalPlan(pushed))
    val viaResidual = a.read(spark)
      .where(col("key") >= lit(be(100L)) && col("key") < lit(be(200L)))
      .select(graft.functions.be_long(col("key"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    val viaPushed = pushed
      .select(graft.functions.be_long(col("key"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(viaPushed.toSeq === viaResidual.toSeq)
    assert(viaPushed.toSeq === (100L until 200L).toSeq)

    // equality degenerates to a one-key range; exclusive bounds honored
    val eq = a.readPartitioned(spark).where(col("key") === lit(be(42L)))
    assert(finalPlan(eq).contains("keyRange="), finalPlan(eq))
    assert(eq.count() === 1L)
    val excl = a.readPartitioned(spark)
      .where(col("key") > lit(be(10L)) && col("key") < lit(be(13L)))
    assert(excl.count() === 2L)

    // rangeScan convenience routes kv domains through the pushed path
    val rs = a.rangeScan(spark, from = Some(be(500L)), to = Some(be(509L)))
    assert(finalPlan(rs).contains("keyRange="), finalPlan(rs))
    assert(rs.count() === 10L)
    // contradiction (from > to) is a valid empty range, not an error
    assert(a.rangeScan(spark, from = Some(be(10L)), to = Some(be(5L))).count() === 0L)
    // Spark still evaluates the predicate per row (residual contract):
    // a filter the source can't narrow (e.g. on value) composes fine
    val mixed = a.readPartitioned(spark)
      .where(col("key") >= lit(be(990L)) && graft.functions.bytes_utf8(col("value")).endsWith("5"))
    assert(mixed.count() === 1L) // v995
  }

  test("runtime filtering (DPP): a selective broadcast join prunes shard files dynamically") {
    import spark.implicits._
    val store = buildDomain("dpp", 8, (0L until 2000L).map(i => i -> s"v$i"))
    // the build side must be a SCAN with a selective filter on top for
    // PartitionPruning's benefit heuristic — a parquet probe table whose
    // tag filter selects 2 of 8 shards
    val probePath = scratch("dpp-probe-keys")
    (0L until 2000L).toDF("k").select(
        graft.functions.long_be(col("k")).as("key"))
      .withColumn("shard", graft.functions.shard_index(col("key"), 8))
      .withColumn("tag", (col("shard") % 4).cast("int"))
      .write.mode("overwrite").parquet(probePath)
    val probe = spark.read.parquet(probePath).where(col("tag") === 0)
    val joined = store.readPartitioned(spark).join(broadcast(probe), Seq("shard", "key"))
    val rows = joined.collect()
    // correctness: exactly the probe's keys resolve
    val expect = (0L until 2000L).filter(k =>
      graft.core.ShardIndex.shardIndex(
        java.nio.ByteBuffer.allocate(8).putLong(k).array(), 8) % 4 == 0)
    assert(rows.length === expect.size)
    // the scan received the runtime `shard IN (...)` filter and opened
    // only the probed shards (2 of 8) — dynamic partition pruning through
    // the DSv2 SupportsRuntimeFiltering seam, with NO engine API involved
    val plan = finalPlan(joined)
    assert(plan.contains("dynamicpruningexpression"), plan)
    assert(plan.contains("shards=2/8"), plan)
  }

  test("versionDiff: added/removed/changed across versions with ZERO shuffle on kv") {
    import spark.implicits._
    val store = buildDomain("vdiff", 4, (0L until 300L).map(i => i -> s"v$i"))
    // v2: drop %7 keys, change %3 values, add 300..309
    val v2 = ((0L until 300L).filter(_ % 7 != 0).map(i =>
      i -> (if (i % 3 == 0) s"CHANGED$i" else s"v$i")) ++
      (300L until 310L).map(i => i -> s"v$i"))
    val df2 = v2.toDF("k", "v").select(
      graft.functions.long_be(col("k")).as("key"),
      graft.functions.utf8_bytes(col("v")).as("value"))
    store.write(df2, version = 2L)

    val diff = withNoBroadcast(store.versionDiff(spark, 1L, 2L))
    val got = diff.select(
        graft.functions.be_long(col("key")).as("k"), col("change"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expAdded = (300L until 310L).toSet
    val expRemoved = (0L until 300L).filter(_ % 7 == 0).toSet
    val expChanged = (0L until 300L).filter(i => i % 7 != 0 && i % 3 == 0).toSet
    assert(got.filter(_._2 == "added").keySet === expAdded)
    assert(got.filter(_._2 == "removed").keySet === expRemoved)
    assert(got.filter(_._2 == "changed").keySet === expChanged)
    assert(got.size === expAdded.size + expRemoved.size + expChanged.size)
    // the scale claim: neither version moves — SPJ full-outer merge join
    val plan = withNoBroadcast {
      val d = store.versionDiff(spark, 1L, 2L)
      d.collect()
      finalPlan(d)
    }
    assert(!plan.contains("Exchange "), plan)
  }

  test("duplicateKeyAudit on a kv domain: finds dup keys with ZERO shuffle") {
    import spark.implicits._
    val store = DomainStore.create(
      scratch("kvv2/dupaudit"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    // key 7 twice, key 13 three times, rest unique
    val rows = ((0L until 100L) ++ Seq(7L, 13L, 13L)).map(i => (i, s"v$i"))
    store.write(
      rows.toDF("k", "v").select(
        graft.functions.long_be(col("k")).as("key"),
        graft.functions.utf8_bytes(col("v")).as("value")),
      version = 1L)
    val audit = store.duplicateKeyAudit(spark)
    val got = audit.collect()
      .map(r => java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](0)).getLong -> r.getLong(2)).toMap
    assert(got === Map(7L -> 2L, 13L -> 3L))
    // the layout-reporting scan already clusters (shard, key): the
    // per-key count aggregates within partitions, no exchange anywhere
    assert(shuffleCount(audit) === 0, finalPlan(audit))
  }

  test("lookupJoin on a kv domain: SPJ path equals parquet-domain results, prunes shards, domain never moves") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => i -> s"v$i")
    val kvStore = buildDomain("lj-kv", 4, rows)
    val pqStore = DomainStore.create(
      scratch("kvv2/lj-pq"), DomainSpec(numShards = 4), new Configuration())
    pqStore.write(
      rows.toDF("k", "v").select(
        graft.functions.long_be(col("k")).as("key"),
        graft.functions.utf8_bytes(col("v")).as("value")),
      version = 1L)
    // probe with a pre-existing "shard" column (the reserved-name hazard)
    // and keys from a narrow range so shard pruning can bite
    val probe = (0L until 40L).toDF("k")
      .select(col("k"), lit(99).as("shard"), graft.functions.long_be(col("k")).as("key"))
    def mat(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("shard"), graft.functions.bytes_utf8(col("value")).as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaKv = mat(kvStore.lookupJoin(probe))
    val viaPq = mat(pqStore.lookupJoin(probe))
    assert(viaKv === viaPq)
    assert(viaKv.size === 40 && viaKv.forall(_._2 === 99)) // probe columns intact
    val plan = kvStore.lookupJoin(probe).queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan kvdomain"), plan)
    assert(!plan.contains("Exchange hashpartitioning(shard"), plan)
    // schema must not depend on the domain's persistence format
    assert(kvStore.lookupJoin(probe).columns.toSeq === pqStore.lookupJoin(probe).columns.toSeq)

    // misses null-fill and null probe keys survive, identically to the
    // datasource branch (left-outer semantics through the SPJ shape)
    val missProbe = Seq(Some(5L), Some(9999L), None).zipWithIndex
      .toDF("k", "ord")
      .select(col("ord"),
        when(col("k").isNotNull, graft.functions.long_be(col("k"))).as("key"))
    def matMiss(df: org.apache.spark.sql.DataFrame) = df
      .select(col("ord"), graft.functions.bytes_utf8(col("value")).as("v"))
      .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    val kvMiss = matMiss(kvStore.lookupJoin(missProbe))
    assert(kvMiss === matMiss(pqStore.lookupJoin(missProbe)))
    assert(kvMiss === Set((0, Some("v5")), (1, None), (2, None)))
  }

  test("readPartitioned on a ramfs kv domain: conf registry reaches the reader tasks") {
    import spark.implicits._
    graft.store.RamFileSystem.clear("kvv2spj")
    val store = DomainStore.create(
      "ramfs://kvv2spj/dom",
      DomainSpec(numShards = 3, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    store.write(
      (0L until 300L).map(i => (i, s"v$i")).toDF("k", "v").select(
        graft.functions.long_be(col("k")).as("key"),
        graft.functions.utf8_bytes(col("v")).as("value")),
      version = 1L)
    val got = store.readPartitioned(spark)
      .select(graft.functions.be_long(col("key")).as("k"),
        graft.functions.bytes_utf8(col("value")).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === (0L until 300L).map(i => (i, s"v$i")).toSet)
    graft.store.RamFileSystem.clear("kvv2spj")
  }

  test("readPartitioned on a non-kv domain fails loud with the migration path") {
    import spark.implicits._
    val store = DomainStore.create(
      scratch("kvv2/parquet-dom"), DomainSpec(numShards = 2), new Configuration())
    store.write(
      Seq((1L, "x")).toDF("k", "v").select(
        graft.functions.long_be(col("k")).as("key"),
        graft.functions.utf8_bytes(col("v")).as("value")),
      version = 1L)
    val e = intercept[IllegalArgumentException](store.readPartitioned(spark))
    assert(e.getMessage.contains("kv-sorted"))
  }
}
