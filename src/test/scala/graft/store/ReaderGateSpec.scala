package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.DomainSpec
import graft.operators.{Dedup, Search, Similarity}

/** The family-wide reader-ownership contract (ReaderGate): under the
  * `new X(KvDomainReader.open(...))` idiom the caller holds no other
  * reference to the inner reader, so EVERY construction-gate failure —
  * wrong index family, bad geometry, ill-shaped quantizer — must close
  * the handed-in reader(s) before throwing, or a daemon retrying
  * against a mid-deploy domain leaks a shard-handle set per attempt.
  * One pin per reader so no single gate can silently fall out of the
  * contract. */
class ReaderGateSpec extends SparkSuite {

  private val conf = new Configuration()

  private def assertClosed(inner: KvDomainReader): Unit = {
    val e = intercept[IllegalStateException](inner.get("x".getBytes("UTF-8")))
    assert(e.getMessage.contains("closed"), e.getMessage)
  }

  test("every reader's construction gate closes the handed-in reader(s) on failure") {
    import spark.implicits._
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "beta gamma delta epsilon zeta eta theta iota kappa lambda").toDF("doc_id", "text")
    val spec = DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted)

    // fixtures: one domain per family
    val bm25Root = scratch("gate/bm25")
    DomainStore.create(bm25Root, spec, conf)
      .write(Search.invertedIndexKv(docs, "doc_id", "text"), 1L)
    val posRoot = scratch("gate/pos")
    DomainStore.create(posRoot, spec, conf)
      .write(Search.positionalIndexKv(docs, "doc_id", "text"), 1L)
    val fpRoot = scratch("gate/fp")
    DomainStore.create(fpRoot, spec.copy(indexType = Dedup.SpanIndexType), conf)
      .write(Dedup.fpIndexKv(docs, "doc_id", "text", minLen = 8, window = 4, modulus = 2), 1L)

    // SearchReader refuses a positional domain — and closes the reader
    val sInner = KvDomainReader.open(posRoot, conf)
    intercept[IllegalStateException](new SearchReader(sInner))
    assertClosed(sInner)

    // PhraseReader refuses a BM25 domain — and closes the reader
    val pInner = KvDomainReader.open(bm25Root, conf)
    intercept[IllegalArgumentException](new PhraseReader(pInner))
    assertClosed(pInner)

    // OverlapReader: BAD GEOMETRY (window > minLen) on a CORRECT-family
    // domain must close too — the parameter requires share the gate
    val oInner = KvDomainReader.open(fpRoot, conf)
    val oe = intercept[IllegalArgumentException](
      new OverlapReader(oInner, minLen = 64, window = 128))
    assert(oe.getMessage.contains("window"), oe.getMessage)
    assertClosed(oInner)

    // AnnReader: a declared NON-PQ index type refuses loud and closes
    // BOTH handed-in readers; same for an ill-shaped quantizer
    val emb = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(-0.25f)))
      .toDF("vec_id", "embedding")
    val centroids = Similarity.fixedCentroids(4, 8)
    val books = Similarity.fixedPqCodebooks(4, 8, 8)
    val ivfRoot = scratch("gate/ivf")
    DomainStore.create(ivfRoot, spec.copy(indexType = Similarity.IvfIndexType), conf)
      .write(Similarity.ivfIndexKv(emb, "vec_id", "embedding", centroids), 1L)
    val vecRoot = scratch("gate/vec")
    DomainStore.create(vecRoot, spec, conf)
      .write(Similarity.vectorKv(emb, "vec_id", "embedding"), 1L)
    val (aPost, aVec) = (KvDomainReader.open(ivfRoot, conf), KvDomainReader.open(vecRoot, conf))
    val ae = intercept[IllegalArgumentException](new AnnReader(aPost, aVec, centroids, books))
    assert(ae.getMessage.contains(Similarity.IvfIndexType), ae.getMessage)
    assertClosed(aPost)
    assertClosed(aVec)
    val (bPost, bVec) = (KvDomainReader.open(vecRoot, conf), KvDomainReader.open(vecRoot, conf))
    intercept[IllegalArgumentException](
      new AnnReader(bPost, bVec, Array.empty[Array[Double]], books))
    assertClosed(bPost)
    assertClosed(bVec)
  }
}
