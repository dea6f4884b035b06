package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MediaRecord, Multimodal}

/**
 * Driver-contract queries for the multimodal-column plumbing. Payloads are
 * opaque binary; the metadata pass (byte length, content digest) is
 * SQL-checkable, and the batched feature extraction is deterministic so its
 * byte-sum feature is checkable too (via unicode codepoints, since payloads
 * here are ASCII text standing in for media bytes).
 */
object MmQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_meta" -> { (s, dir) =>
      Multimodal.describe(
        Multimodal.pack(Fixtures.table(s, dir, "documents"), "doc_id", "text"))
        .select(col("media_id"), col("n_bytes"), col("content_md5"))
    },
    "mm_features" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.pack(Fixtures.table(s, dir, "documents"), "doc_id", "text")
        .as[MediaRecord]
      Multimodal.extractFeatures(s, media).toDF()
        .select(
          col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          col("byte_sum"))
    })

  def oracleSql: Map[String, String] = Map(
    "mm_media_meta" ->
      """SELECT doc_id AS media_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS content_md5
        |FROM documents""".stripMargin,
    // ASCII payloads: byte values == unicode codepoints.
    "mm_features" ->
      """SELECT doc_id AS media_id,
        |  octet_length(text::BLOB) % 640 AS width,
        |  octet_length(text::BLOB) % 480 AS height,
        |  1 + octet_length(text::BLOB) % 8 AS n_frames,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(unicode(c) AS BIGINT) FOR c IN list_filter(string_split(text, ''), x -> x != '')]),
        |    (a, b) -> a + b) AS BIGINT) AS byte_sum
        |FROM documents""".stripMargin)
}
