package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.DomainSpec
import graft.operators.Dedup

/** The Spark-free overlap probe must be BIT-IDENTICAL to the Spark-side
  * index probe: same anchor kernel (AnchorMath — one definition), same
  * md5-over-UTF-8 fingerprints, same published domain. Any drift between
  * the two would make admission-time checks disagree with batch dedup. */
class OverlapReaderSpec extends SparkSuite {

  private val conf = new Configuration()

  test("OverlapReader == Spark probe on a published fp index (incl. non-BMP)") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val (run1, run2) = (randText(200), randText(200))
    val corpus = Seq(
      1L -> (randText(100) + run1 + randText(300)),
      2L -> ("😀" + randText(49) + run1 + randText(350)), // non-BMP prefix
      3L -> (randText(250) + run2 + randText(150)),
      4L -> randText(600)).toDF("doc_id", "text")
    val spec = DomainSpec(
      numShards = 4, persistenceFormat = DomainSpec.KvSorted,
      indexer = classOf[BloomKeyIndexer].getName,
      indexType = Dedup.SpanIndexType)
    val root = scratch("overlap-reader")
    val store = DomainStore.create(root, spec, conf)
    store.write(Dedup.fpIndexKv(corpus, "doc_id", "text"), 1L)

    val reader = new OverlapReader(KvDomainReader.open(root, conf))
    try {
      // probe texts: run1 carrier (hits docs 1+2), run2 carrier (doc 3),
      // clean text (no hits), short text (no anchors possible), and a
      // NON-BMP probe — the emoji before the run shifts every UTF-16
      // unit after it, so a code-unit bug in the READER's own extraction
      // (AnchorMath input or the codepoint substring) would fingerprint
      // different text than the Spark side and silently disagree
      val probes = Seq(
        100L -> (randText(80) + run1 + randText(20)),
        101L -> ("x" + run2),
        102L -> randText(500),
        103L -> "too short",
        104L -> ("🚀" + randText(19) + run1 + randText(60)))
      // Spark-side truth for the same delta through the SAME domain
      val sparkPairs = Dedup.sharedSubstringAgainstIndex(
          store, probes.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(sparkPairs === Set((100L, 1L), (100L, 2L), (101L, 3L),
        (104L, 1L), (104L, 2L)))
      probes.foreach { case (pid, text) =>
        val served = reader.overlapping(text)
        val expected = sparkPairs.collect { case (`pid`, c) => c }.toSeq.sorted
        assert(served === expected, s"probe $pid drifted: $served vs $expected")
        assert(reader.isContaminated(text) === expected.nonEmpty)
      }
      // fingerprint keys equal the Spark kernel's for the NON-BMP probe
      val text = probes(4)._2
      val sparkFps = Seq(text).toDF("text").select(col("text"))
        .select(explode(graft.functions.anchor_positions(col("text"), 8, 16)).as("pos"),
          col("text"))
        .where(col("pos") <= length(col("text")) - 63)
        .select(unhex(md5(expr("substring(text, pos, 64)"))).as("fp"))
        .collect().map(_.getAs[Array[Byte]](0).toSeq).toSet
      assert(reader.fingerprints(text).map(_.toSeq).toSet === sparkFps)
      assert(sparkFps.nonEmpty)
      // no anchors on sub-minLen text
      assert(reader.fingerprints("tiny").isEmpty)

      // BATCHED admission == per-doc answers on the same mixed batch
      // (hit carriers, clean, too-short, non-BMP — the full probe set,
      // plus a duplicate carrier so the cross-doc key dedup is real),
      // alignment preserved
      val batch = probes.map(_._2) ++ Seq(probes.head._2, "")
      val batched = reader.overlappingAll(batch)
      assert(batched.length === batch.length)
      batch.zip(batched).foreach { case (text, got) =>
        assert(got === reader.overlapping(text),
          s"batched answer drifted on '${text.take(20)}…'")
      }
      assert(reader.overlappingAll(Seq.empty).isEmpty)
    } finally reader.close()

    // a wrong-family domain fails loud at reader construction
    val bandRoot = scratch("overlap-reader-band")
    val band = DomainStore.create(
      bandRoot, spec.copy(indexType = Dedup.BandIndexType), conf)
    band.write(Dedup.bandIndexKv(corpus, "doc_id", "text"), 1L)
    val inner = KvDomainReader.open(bandRoot, conf)
    val e = intercept[IllegalArgumentException](new OverlapReader(inner))
    assert(e.getMessage.contains(Dedup.BandIndexType), e.getMessage)
    // ...and the gate CLOSED the handed-in reader before throwing (the
    // caller holds no other reference in the open(...) idiom — an open
    // reader here is a shard-handle leak per failed construction)
    val closed = intercept[IllegalStateException](inner.get("x".getBytes("UTF-8")))
    assert(closed.getMessage.contains("closed"), closed.getMessage)
  }
}
