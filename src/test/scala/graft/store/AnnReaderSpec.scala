package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.DomainSpec
import graft.operators.Similarity

/** The Spark-free ANN serving stack: publish the PQ posting-list domain
  * and the vector domain with Spark, then answer top-k queries from any
  * JVM — and get BIT-IDENTICAL results to the Spark-side
  * ivfPqSearchIndex pipeline over the same domains. */
class AnnReaderSpec extends SparkSuite {

  test("served topK == ivfPqSearchIndex, query by query (incl. shortlist ties and misses)") {
    val conf = new Configuration()
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val centroids = Similarity.fixedCentroids(8, 64)
    val books = Similarity.fixedPqCodebooks(8, 16, 8)
    val (k, nprobe, rerank) = (5, 3, 4)

    val postRoot = scratch("annreader/postings")
    val postings = DomainStore.create(
      postRoot, DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted), conf)
    postings.write(Similarity.ivfPqIndexKv(emb, "vec_id", "embedding", centroids, books), 1L)

    val vecRoot = scratch("annreader/vectors")
    val vecStore = DomainStore.create(
      vecRoot, DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted), conf)
    vecStore.write(Similarity.vectorKv(emb, "vec_id", "embedding"), 1L)

    val queries = emb.where(col("vec_id") % 25 === 0)
    val expected = Similarity.ivfPqSearchIndex(
      postings, emb, queries, "vec_id", "embedding", k, centroids, books, nprobe, rerank)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(_._2).sortBy(_._2).toIndexedSeq }

    val qVecs = queries.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(qVecs.nonEmpty)

    val reader = new AnnReader(
      KvDomainReader.open(postRoot, new Configuration()),
      KvDomainReader.open(vecRoot, new Configuration()),
      centroids, books)
    try {
      qVecs.foreach { case (qid, vec) =>
        val served = reader.topK(vec, k, nprobe, rerank, excludeId = Some(qid))
        assert(served === expected.getOrElse(qid, IndexedSeq.empty),
          s"query $qid: served $served != spark ${expected.get(qid)}")
      }
      // a zero-norm query returns the Spark pipeline's answer (no rows),
      // never Infinity-ranked garbage
      assert(reader.topK(Array.fill(64)(0.0), k, nprobe, rerank) === IndexedSeq.empty)
    } finally reader.close()
  }

  test("AnnReader on a PLAIN posting domain fails loud naming the format") {
    val conf = new Configuration()
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val centroids = Similarity.fixedCentroids(8, 64)
    val books = Similarity.fixedPqCodebooks(8, 16, 8)
    val plainRoot = scratch("annreader/plain")
    val plain = DomainStore.create(
      plainRoot, DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted), conf)
    plain.write(Similarity.ivfIndexKv(emb, "vec_id", "embedding", centroids), 1L)
    val vecRoot2 = scratch("annreader/plain-vectors")
    val vs = DomainStore.create(
      vecRoot2, DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted), conf)
    vs.write(Similarity.vectorKv(emb, "vec_id", "embedding"), 1L)
    val reader = new AnnReader(
      KvDomainReader.open(plainRoot, new Configuration()),
      KvDomainReader.open(vecRoot2, new Configuration()),
      centroids, books)
    try {
      val q = emb.select(org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
        .head.getSeq[Double](0).toArray
      val e = intercept[IllegalArgumentException](reader.topK(q, 3))
      assert(e.getMessage.contains("ivfPqIndexKv"), e.getMessage)
    } finally reader.close()
  }
}
