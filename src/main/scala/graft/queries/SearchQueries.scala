package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DomainSpec
import graft.operators.Search

/** Contract queries for ranked full-text retrieval served from a
  * published inverted-index domain (graft.operators.Search). The oracle
  * replays the ENTIRE pipeline — tokenization, tf/df/length stats, the
  * postings cap, the exact-integer BM25 and the top-k — in DuckDB SQL, so
  * a hash match pins build + publish + probe + scoring end to end. */
object SearchQueries {

  /** Literal benchmark queries: one source of truth for the Spark frame
    * and the oracle's VALUES list. Terms are drawn from the synthetic
    * corpus vocabulary so df spans common→rare. */
  val QueryLits: Seq[(Long, String)] = Seq(
    0L -> "spark window agg",
    1L -> "customer query table part",
    2L -> "vector stream merge fast big")

  val TopK = 10

  private def queriesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    QueryLits.toDF("query_id", "query_text")
  }

  /** BUILD half: the documents corpus's inverted index published as a
    * servable kv-sorted domain (memoized per sf by Fixtures so the bench
    * can attribute build vs probe). */
  def searchIndexStore(s: SparkSession, dir: String): graft.store.DomainStore = {
    val spec = DomainSpec(numShards = 8, persistenceFormat = DomainSpec.KvSorted)
    Fixtures.domain(s, dir, "search-index", spec) { (st, sp) =>
      st.write(
        Search.invertedIndexKv(Fixtures.table(sp, dir, "documents"), "doc_id", "text"),
        version = 1L)
    }
  }

  def searchProbe(s: SparkSession, dir: String): DataFrame =
    Search.searchTopK(searchIndexStore(s, dir), queriesDf(s), k = TopK)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_search_topk" -> { (s, dir) => searchProbe(s, dir) })

  /** The query's (query_id, term) pairs, tokenized with the engine's own
    * unit (lowercased `[a-z0-9]+` runs), distinct per query. */
  private def qtermValues: String =
    QueryLits.flatMap { case (qid, text) =>
      "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq.distinct
        .map(t => s"(CAST($qid AS BIGINT), '$t')")
    }.mkString(",\n|")

  val oracleSql: Map[String, String] = Map(
    // Full replay: tokenize -> tf -> df (with the postings cap) -> doc
    // lengths -> corpus stats -> exact-integer BM25 contribution per
    // (query term, doc) -> integer sum -> rank. HUGEINT keeps every
    // product exact; `//` == Spark's decimal `div` for positive operands.
    "text_search_topk" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY doc_id, term),
         |dfs AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tf GROUP BY term HAVING count(*) <= ${Search.MaxPostings}),
         |lens AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS len
         |  FROM toks GROUP BY doc_id),
         |stats AS (
         |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         |         (SELECT CAST(count(*) AS BIGINT) FROM toks) AS t),
         |q(query_id, term) AS (VALUES
         |$qtermValues),
         |contrib AS (
         |  SELECT q.query_id, tf.doc_id,
         |    (CAST(${1L << Search.ScaleBits} AS HUGEINT)
         |       * (s.n - d.df + 1) * tf.tf * 22 * s.t)
         |    // (CAST(d.df + 1 AS HUGEINT)
         |       * (10 * CAST(tf.tf AS HUGEINT) * s.t + 3 * CAST(s.t AS HUGEINT)
         |          + 9 * CAST(l.len AS HUGEINT) * s.n)) AS c
         |  FROM q
         |  JOIN dfs d USING (term)
         |  JOIN tf USING (term)
         |  JOIN lens l ON l.doc_id = tf.doc_id
         |  CROSS JOIN stats s),
         |scored AS (
         |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score
         |  FROM contrib GROUP BY query_id, doc_id),
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
         |  FROM scored)
         |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin)
}
