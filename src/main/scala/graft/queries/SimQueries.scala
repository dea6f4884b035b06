package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Driver-contract queries for similarity search. The exact brute-force
 * top-k has a full DuckDB oracle; the LSH ANN variant is approximate by
 * design (no SQL oracle — its recall against the exact result is pinned in
 * ScalaTest instead).
 */
object SimQueries {

  val TopK = 10
  val QueryMod = 100

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_exact" -> { (s, dir) =>
      val emb = Fixtures.table(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb,
        emb.where(col("vec_id") % QueryMod === 0),
        "vec_id", "embedding", TopK)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
    },
    "sim_ann_lsh" -> { (s, dir) =>
      val emb = Fixtures.table(s, dir, "embeddings")
      Similarity.annTopK(
        emb,
        emb.where(col("vec_id") % QueryMod === 0),
        "vec_id", "embedding", TopK)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
    },
    "sim_ann_ivf" -> { (s, dir) =>
      val emb = Fixtures.table(s, dir, "embeddings")
      Similarity.ivfTopK(
        emb,
        emb.where(col("vec_id") % QueryMod === 0),
        "vec_id", "embedding", TopK)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
    },
    // IVF-PQ: candidates travel as m shorts per vector (not dim doubles),
    // ADC preselect + exact re-rank. Approximate by design (no SQL
    // oracle); recall + the exhaustive-probe identity pinned in ScalaTest.
    "sim_ann_ivfpq" -> { (s, dir) =>
      val emb = Fixtures.table(s, dir, "embeddings")
      Similarity.ivfPqTopK(
        emb,
        emb.where(col("vec_id") % QueryMod === 0),
        "vec_id", "embedding", TopK)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
    })

  def oracleSql: Map[String, String] = Map(
    "sim_topk_exact" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id % $QueryMod = 0),
         |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cos
         |  FROM embeddings e JOIN q ON e.vec_id != q.query_id),
         |ranked AS (SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= $TopK""".stripMargin)
  // sim_ann_lsh / sim_ann_ivf: intentionally no oracle (approximate
  // operators; recall pinned against the exact result in OperatorsSpec).
}
