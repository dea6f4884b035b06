package graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.functions._
import graft.operators.Search
import graft.store.DomainStore

/** The one-call ops report (reference web-UI analog): catalog + shard
  * totals + index census fused into one frame. */
class StatusSpec extends SparkSuite {

  private val conf = new Configuration()

  test("report: plain kv, bm25 index, and positional index domains each read right") {
    import spark.implicits._
    val root = scratch("status-cat")
    val docs = Seq(1L -> "cat sat on the mat", 2L -> "dog ran after the cat")
      .toDF("doc_id", "text")

    val plain = DomainStore.create(
      s"$root/plain-kv", DomainSpec(2, persistenceFormat = DomainSpec.KvSorted), conf)
    plain.write(
      Seq("a" -> "1", "b" -> "2", "c" -> "3").toDF("k", "v")
        .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
      1L)

    val bm25 = DomainStore.create(
      s"$root/bm25-idx", DomainSpec(4, persistenceFormat = DomainSpec.KvSorted), conf)
    bm25.write(Search.invertedIndexKv(docs, "doc_id", "text"), 1L)

    val pos = DomainStore.create(
      s"$root/pos-idx", DomainSpec(4, persistenceFormat = DomainSpec.KvSortedZ), conf)
    pos.write(Search.positionalIndexKv(docs, "doc_id", "text"), 1L)

    // a created-but-never-published domain must report loading, zero rows
    DomainStore.create(
      s"$root/empty", DomainSpec(2, persistenceFormat = DomainSpec.KvSorted), conf)

    val df = Status.report(spark, root, conf)
    val idx = df.columns.zipWithIndex.toMap
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("plain-kv", "bm25-idx", "pos-idx", "empty"))

    val p = rows("plain-kv")
    assert(p.getString(idx("status")) === "ready")
    assert(p.getLong(idx("n_rows")) === 3L)
    assert(p.isNullAt(idx("index_type")), "plain kv is not an index")

    val b = rows("bm25-idx")
    assert(b.getString(idx("index_type")) === "bm25")
    val census = b.getString(idx("index_classes"))
    // doc records for 2 docs, meta, and some term postings
    assert(census.contains("d=2:"), census)
    assert(census.contains("m=1:"), census)
    assert(census.contains("t="), census)

    val q = rows("pos-idx")
    assert(q.getString(idx("index_type")) === "positional")
    assert(q.getString(idx("persistence_format")) === DomainSpec.KvSortedZ)
    assert(q.getString(idx("index_classes")).contains("p="), "positional postings counted")

    val e = rows("empty")
    assert(e.getString(idx("status")) === "loading")
    assert(e.getLong(idx("n_rows")) === 0L)
    assert(e.getLong(idx("empty_shards")) === 2L)

    // shard skew columns are coherent: max >= min, totals add up
    assert(b.getLong(idx("max_shard_rows")) >= b.getLong(idx("min_shard_rows")))
    assert(b.getLong(idx("n_rows")) === bm25.count(spark))
  }

  test("report is one pass: O(1) Spark jobs for a catalog of non-index domains") {
    import spark.implicits._
    val root = scratch("status-jobs")
    (0 until 6).foreach { i =>
      val d = DomainStore.create(
        s"$root/dom$i", DomainSpec(2, persistenceFormat = DomainSpec.KvSorted), conf)
      d.write(
        Seq(s"k$i" -> s"v$i", s"q$i" -> s"w$i").toDF("k", "v")
          .select(utf8_bytes(col("k")).as("key"), utf8_bytes(col("v")).as("value")),
        1L)
    }
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.LongAdder()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if ("status-pin" == j.properties.getProperty("spark.jobGroup.id"))
          jobs.increment()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup("status-pin", "status one-pass pin")
      val got = Status.report(spark, root, conf).collect()
      spark.sparkContext.clearJobGroup()
      assert(got.length === 6)
      assert(got.forall(_.getLong(8) === 2L), "each domain reports its 2 rows")
      // listener events are async; give the queue a beat
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline && jobs.sum() == 0) Thread.sleep(20)
      // shard totals fold driver-side: the whole report costs at most the
      // final local collect (not one aggregate job per domain — 6 domains
      // under the old shape ran >= 6)
      assert(jobs.sum() <= 2, s"Status.report started ${jobs.sum()} jobs for 6 plain domains")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
