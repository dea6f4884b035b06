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

  /** Literal phrase queries — drawn from the corpus vocabulary so
    * occurrence counts span none→several; query 3 repeats a term (the
    * distinct-offset edge). */
  val PhraseLits: Seq[(Long, String)] = Seq(
    0L -> "fast table",
    1L -> "table part",
    2L -> "agg row scan",
    3L -> "table table")

  private def phrasesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    PhraseLits.toDF("query_id", "phrase")
  }

  /** BUILD half of phrase search: the corpus's POSITIONAL index published
    * as its own servable kv domain — on the BLOCK-COMPRESSED engine
    * (position CSV is exactly the redundant payload kv-sorted-z exists
    * for), so the driver gate exercises a compressed domain through a
    * composed build→publish→multiGet pipeline. */
  def positionalIndexStore(s: SparkSession, dir: String): graft.store.DomainStore = {
    val spec = DomainSpec(numShards = 8, persistenceFormat = DomainSpec.KvSortedZ)
    Fixtures.domain(s, dir, "search-positional", spec) { (st, sp) =>
      st.write(
        Search.positionalIndexKv(Fixtures.table(sp, dir, "documents"), "doc_id", "text"),
        version = 1L)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_search_topk" -> { (s, dir) => searchProbe(s, dir) },
    "text_search_phrase" -> { (s, dir) =>
      Search.phraseSearch(positionalIndexStore(s, dir), phrasesDf(s), k = TopK) },
    // Rank fusion: phrase match constrains the candidate set, exact-
    // integer BM25 of the phrase's distinct terms orders it — tf/df from
    // the positional postings, length norm from d:, constants from
    // m:stats; the oracle replays match AND score AND rank end to end.
    "text_search_phrase_ranked" -> { (s, dir) =>
      Search.phraseSearchRanked(positionalIndexStore(s, dir), phrasesDf(s), k = TopK) },
    // Ops health report of the published BM25 index: per record class
    // (postings/doc/meta) counts, value payload, hottest postings list —
    // the oracle REBUILDS every value string (string_agg in doc order)
    // and measures it, so even the CSV byte accounting is pinned.
    "text_search_stats" -> { (s, dir) =>
      Search.indexStats(s, searchIndexStore(s, dir)) })

  /** The query's (query_id, term) pairs, tokenized with the engine's own
    * unit (lowercased `[a-z0-9]+` runs), distinct per query. */
  private def qtermValues: String =
    QueryLits.flatMap { case (qid, text) =>
      "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq.distinct
        .map(t => s"(CAST($qid AS BIGINT), '$t')")
    }.mkString(",\n|")

  /** The phrase queries' (query_id, offset, term) triples — duplicates
    * KEPT with their offsets (phrase semantics). */
  private def phraseTermValues: String =
    PhraseLits.flatMap { case (qid, text) =>
      "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq.zipWithIndex.map { case (t, j) =>
        s"(CAST($qid AS BIGINT), CAST($j AS BIGINT), '$t')"
      }
    }.mkString(",\n|")

  /** The phrase queries' DISTINCT terms — the scoring unit of the ranked
    * fusion (BM25 scores a term once however often the phrase repeats it). */
  private def phraseDistinctTermValues: String =
    PhraseLits.flatMap { case (qid, text) =>
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
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    // Phrase replay: tokenize WITH POSITIONS (unnest(range) + 1-based
    // list_extract), every (term@offset j) match votes for anchor
    // pos - j, an anchor holding ALL offsets is one occurrence, rank by
    // occurrence count. The postings cap is deliberately NOT modeled:
    // phraseSearch FAILS LOUD on a tombstoned query term (eliding one
    // silently undercounts phrases), so a corpus where the cap bites
    // cannot reach this comparison.
    "text_search_phrase" ->
      s"""WITH ts AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |  FROM documents),
         |tok0 AS (
         |  SELECT doc_id, toks, unnest(range(0, len(toks))) AS pos FROM ts),
         |tok AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    list_extract(toks, CAST(pos + 1 AS INT)) AS term
         |  FROM tok0),
         |q(query_id, j, term) AS (VALUES
         |$phraseTermValues),
         |qn AS (
         |  SELECT query_id, count(DISTINCT j) AS n_terms FROM q GROUP BY query_id),
         |cand AS (
         |  SELECT q.query_id, q.j, tok.doc_id, tok.pos - q.j AS anchor
         |  FROM q JOIN tok USING (term) WHERE tok.pos - q.j >= 0),
         |occ AS (
         |  SELECT query_id, doc_id, anchor, count(DISTINCT j) AS found
         |  FROM cand GROUP BY 1, 2, 3),
         |m AS (
         |  SELECT o.query_id, o.doc_id, CAST(count(*) AS BIGINT) AS n_matches
         |  FROM occ o JOIN qn USING (query_id)
         |  WHERE o.found = qn.n_terms
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, doc_id, n_matches,
         |    row_number() OVER (PARTITION BY query_id ORDER BY n_matches DESC, doc_id) AS rank
         |  FROM m)
         |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_matches,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    // Ranked fusion replay: the phrase-match CTEs verbatim, then the
    // BM25 CTEs verbatim over the DISTINCT phrase terms, joined so only
    // matching docs score; rank by (score desc, doc_id). HUGEINT `//`
    // == Spark's decimal `div` for positive operands, like the topk
    // oracle. `ts` feeds three consumers -> AS MATERIALIZED (CLAUDE.md:
    // default inlining doubles the expansion per stage).
    "text_search_phrase_ranked" ->
      s"""WITH ts AS MATERIALIZED (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |  FROM documents),
         |tok0 AS (
         |  SELECT doc_id, toks, unnest(range(0, len(toks))) AS pos FROM ts),
         |tok AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    list_extract(toks, CAST(pos + 1 AS INT)) AS term
         |  FROM tok0),
         |q(query_id, j, term) AS (VALUES
         |$phraseTermValues),
         |qn AS (
         |  SELECT query_id, count(DISTINCT j) AS n_terms FROM q GROUP BY query_id),
         |cand AS (
         |  SELECT q.query_id, q.j, tok.doc_id, tok.pos - q.j AS anchor
         |  FROM q JOIN tok USING (term) WHERE tok.pos - q.j >= 0),
         |occ AS (
         |  SELECT query_id, doc_id, anchor, count(DISTINCT j) AS found
         |  FROM cand GROUP BY 1, 2, 3),
         |m AS (
         |  SELECT o.query_id, o.doc_id, CAST(count(*) AS BIGINT) AS n_matches
         |  FROM occ o JOIN qn USING (query_id)
         |  WHERE o.found = qn.n_terms
         |  GROUP BY 1, 2),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS term FROM ts) GROUP BY 1, 2),
         |dfs AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tf GROUP BY term HAVING count(*) <= ${Search.MaxPostings}),
         |lens AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM ts),
         |stats AS (
         |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         |         (SELECT CAST(coalesce(sum(len), 0) AS BIGINT) FROM lens) AS t),
         |qd(query_id, term) AS (VALUES
         |$phraseDistinctTermValues),
         |contrib AS (
         |  SELECT m.query_id, m.doc_id, m.n_matches,
         |    (CAST(${1L << Search.ScaleBits} AS HUGEINT)
         |       * (s.n - d.df + 1) * tf.tf * 22 * s.t)
         |    // (CAST(d.df + 1 AS HUGEINT)
         |       * (10 * CAST(tf.tf AS HUGEINT) * s.t + 3 * CAST(s.t AS HUGEINT)
         |          + 9 * CAST(l.len AS HUGEINT) * s.n)) AS c
         |  FROM m
         |  JOIN qd USING (query_id)
         |  JOIN tf ON tf.term = qd.term AND tf.doc_id = m.doc_id
         |  JOIN dfs d ON d.term = qd.term
         |  JOIN lens l ON l.doc_id = m.doc_id
         |  CROSS JOIN stats s),
         |scored AS (
         |  SELECT query_id, doc_id, n_matches, CAST(sum(c) AS BIGINT) AS score
         |  FROM contrib GROUP BY 1, 2, 3),
         |ranked AS (
         |  SELECT query_id, doc_id, n_matches, score,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
         |  FROM scored)
         |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_matches, score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    // Rebuild each record class's exact value strings from the corpus and
    // measure them: postings = "doc:tf,..." in doc order, d: = the token
    // count's decimal digits, m: = "n,total". The postings cap (no term
    // here comes near 65536 docs) and tombstone class replay via HAVING —
    // at gate scale the x class is empty on both sides.
    "text_search_stats" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
         |  FROM documents),
         |tfc AS (
         |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
         |  GROUP BY 1, 2),
         |tvals AS (
         |  SELECT term,
         |    string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS v,
         |    CAST(count(*) AS BIGINT) AS df
         |  FROM tfc GROUP BY term HAVING count(*) <= ${Search.MaxPostings}),
         |lens AS MATERIALIZED (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS len FROM toks),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(coalesce(sum(len), 0) AS BIGINT) AS tt FROM lens)
         |SELECT 't' AS record_class, CAST(count(*) AS BIGINT) AS n_records,
         |  CAST(sum(octet_length(v::BLOB)) AS BIGINT) AS value_bytes,
         |  CAST(max(df) AS BIGINT) AS max_entries
         |FROM tvals
         |UNION ALL
         |SELECT 'd', CAST(count(*) AS BIGINT),
         |  CAST(sum(octet_length(CAST(len AS VARCHAR)::BLOB)) AS BIGINT),
         |  CAST(NULL AS BIGINT)
         |FROM lens
         |UNION ALL
         |SELECT 'm', CAST(1 AS BIGINT),
         |  CAST(octet_length((CAST(n AS VARCHAR) || ',' || CAST(tt AS VARCHAR))::BLOB) AS BIGINT),
         |  CAST(NULL AS BIGINT)
         |FROM stats""".stripMargin)
}
