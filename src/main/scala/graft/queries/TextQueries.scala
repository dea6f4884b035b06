package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Driver-contract queries for the text-analysis operators; every heuristic
  * is replicated exactly in the DuckDB oracle (integer/string math only,
  * plus double divisions of identical integers). */
object TextQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> { (s, dir) =>
      val t = col("text")
      Fixtures.table(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(t).cast("long").as("ws_tokens"),
        TextAnalysis.bpeTokenCount(t).cast("long").as("bpe_tokens"))
    },
    "text_quality" -> { (s, dir) =>
      TextAnalysis.qualityReport(Fixtures.table(s, dir, "documents"), "doc_id", "text")
    },
    "text_langid" -> { (s, dir) =>
      TextAnalysis.langIdReport(Fixtures.table(s, dir, "documents"), "doc_id", "text")
    },
    "text_fingerprint" -> { (s, dir) =>
      Fixtures.table(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    },
    "text_corpus_stats" -> { (s, dir) =>
      TextAnalysis.corpusStats(Fixtures.table(s, dir, "documents"), "text")
    },
    // Deterministic md5-bucket train/valid/test split (98/1/1 per-mille
    // 980/10/10): same id -> same split in any engine, forever.
    "samp_split_counts" -> { (s, dir) =>
      graft.operators.Sampling.split(
        Fixtures.table(s, dir, "documents"), "doc_id",
        Seq("train" -> 980, "valid" -> 10, "test" -> 10))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
    })

  private val stopSet = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  private def occSql(m: String): String =
    s"CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' $m ', ''))) / ${m.length + 2} AS BIGINT)"

  private def scoreSql(lang: String): String =
    TextAnalysis.LangMarkers.toMap.apply(lang).map(occSql).mkString(" + ")

  def oracleSql: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\S+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens
        |FROM documents""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  length(text) AS n_chars,
         |  len(regexp_extract_all(text, '\\S+')) AS ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_tokens,
         |  len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> t IN ($stopSet))) AS stopword_cnt,
         |  length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS punct_cnt,
         |  CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> t IN ($stopSet))) AS DOUBLE)
         |    / greatest(len(regexp_extract_all(text, '\\S+')), 1) AS stopword_ratio,
         |  CAST(length(text) AS DOUBLE)
         |    / greatest(len(regexp_extract_all(text, '\\S+')), 1) AS avg_token_len
         |FROM documents""".stripMargin,
    "text_langid" -> {
      val langs = TextAnalysis.LangMarkers.map(_._1)
      val scoreCols = langs.map(l => s"${scoreSql(l)} AS score_$l").mkString(",\n  ")
      // same argmax-with-priority CASE chain as TextAnalysis.langId
      val cases = langs.zipWithIndex.map { case (l, i) =>
        val later = langs.drop(i + 1).map(o => s"score_$l >= score_$o")
        val conds = (later :+ s"score_$l > 0").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ")
      s"""WITH s AS (SELECT doc_id,
         |  $scoreCols
         |FROM documents)
         |SELECT doc_id, score_en, score_de, score_fr, score_es,
         |  CASE $cases ELSE 'und' END AS lang_pred
         |FROM s""".stripMargin
    },
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT) FOR c IN list_filter(string_split(text, ''), x -> x != '')]),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents""".stripMargin,
    "text_corpus_stats" ->
      """WITH d AS (SELECT length(text) AS n_chars, len(regexp_extract_all(text, '\S+')) AS ws FROM documents),
        |doc AS (SELECT count(*) AS n_docs, CAST(sum(ws) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
        |  CAST(sum(CASE WHEN n_chars >= 200 AND n_chars < 400 THEN 1 ELSE 0 END) AS BIGINT) AS mid_docs,
        |  CAST(sum(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS long_docs FROM d),
        |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab_size
        |      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents))
        |SELECT * FROM doc CROSS JOIN v""".stripMargin,
    "samp_split_counts" ->
      """WITH b AS (SELECT doc_id,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 1000 AS bk FROM documents)
        |SELECT CASE WHEN bk < 980 THEN 'train' WHEN bk < 990 THEN 'valid' ELSE 'test' END AS split,
        |  count(*) AS n, min(doc_id) AS min_id
        |FROM b GROUP BY 1""".stripMargin)
}
