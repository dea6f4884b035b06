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
        |FROM documents""".stripMargin)
}
