package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
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

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] = {
    df.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }
  }
  private def sorts(df: DataFrame): Seq[SortExec] =
    df.queryExecution.executedPlan.collect { case s: SortExec => s }

  test("storage-partitioned join of two same-sharded kv domains: no shuffle, no sort") {
    val a = buildDomain("spj-a", 4, (0L until 1000L).filter(_ % 2 == 0).map(i => i -> s"a$i"))
    val b = buildDomain("spj-b", 4, (0L until 1000L).filter(_ % 3 == 0).map(i => i -> s"b$i"))

    val joined = a.readPartitioned(spark).as("a")
      .join(b.readPartitioned(spark).as("b"), Seq("shard", "key"))
      .select(
        graft.functions.be_long(col("key")).as("k"),
        graft.functions.bytes_utf8(col("a.value")).as("av"),
        graft.functions.bytes_utf8(col("b.value")).as("bv"))

    val got = joined.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val want = (0L until 1000L).filter(i => i % 6 == 0).map(i => (i, s"a$i", s"b$i"))
    assert(got.toSeq === want)

    // The SPJ contract itself: co-partitioned merge join straight off the
    // shard files — no exchange, no sort, on either side.
    assert(shuffles(joined).isEmpty, joined.queryExecution.executedPlan.toString)
    assert(sorts(joined).isEmpty, joined.queryExecution.executedPlan.toString)
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
