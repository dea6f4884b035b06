package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/**
 * The end-to-end composition check: a realistic training-corpus
 * preprocessing recipe chaining the pipeline operators — quality gate →
 * language gate → test-set decontamination → exact dedup representative
 * selection — verified against one DuckDB oracle that replays every
 * stage. Each stage is oracle-verified on its own elsewhere; this query
 * pins that the stages compose (id plumbing, filter ordering, join
 * semantics between them).
 */
object PipelineQueries {

  import TextQueries.{BenchMod, DecontamN}

  val MinTokens = 20

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_corpus_filter" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      val bench = docs.where(col("doc_id") % BenchMod === 0)
      val corpus = docs.where(col("doc_id") % BenchMod =!= 0)
      // quality + language gates: per-row, no shuffle
      val gated = corpus.where(
        TextAnalysis.wsTokenCount(col("text")) >= MinTokens &&
          TextAnalysis.langScore(col("text"), "en") > 0)
      // decontamination gate: ids of clean docs only
      val clean = TextAnalysis.decontaminate(gated, bench, "doc_id", "text", DecontamN)
        .where(col("contaminated") === 0)
        .select("doc_id")
      val surviving = gated.join(clean, "doc_id")
      // dedup decision: keep the min-id representative of each normalized
      // text among survivors
      val reps = Dedup.exact(surviving, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      surviving.join(reps, "doc_id")
        .select(
          col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).cast("long").as("n_tokens"))
    })

  def oracleSql: Map[String, String] = Map(
    "pipeline_corpus_filter" -> {
      val scoreEn = TextQueries.scoreSql("en")
      s"""WITH gated AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % $BenchMod != 0
         |    AND len(regexp_extract_all(text, '\\S+')) >= $MinTokens
         |    AND $scoreEn > 0),
         |btoks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
         |  FROM documents WHERE doc_id % $BenchMod = 0),
         |bench AS (SELECT DISTINCT
         |    unnest([array_to_string(t[i:i+${DecontamN - 1}], ' ') FOR i IN range(1, len(t) - ${DecontamN - 2})]) AS g
         |  FROM btoks WHERE len(t) >= $DecontamN),
         |gtoks AS (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM gated),
         |ggrams AS (SELECT doc_id,
         |    unnest([array_to_string(t[i:i+${DecontamN - 1}], ' ') FOR i IN range(1, len(t) - ${DecontamN - 2})]) AS g
         |  FROM gtoks WHERE len(t) >= $DecontamN),
         |contaminated AS (SELECT DISTINCT ggrams.doc_id FROM ggrams JOIN bench USING (g)),
         |surviving AS (SELECT doc_id, text FROM gated
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |norms AS (SELECT doc_id, text,
         |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
         |  FROM surviving),
         |reps AS (SELECT min(doc_id) AS doc_id FROM norms GROUP BY norm)
         |SELECT n.doc_id, len(regexp_extract_all(n.text, '\\S+')) AS n_tokens
         |FROM norms n JOIN reps USING (doc_id)""".stripMargin
    })
}
