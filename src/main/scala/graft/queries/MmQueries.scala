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

  /** The oracle can only express per-character ops, so both sides restrict
    * to documents where UTF-8 bytes == characters (pure ASCII). Today's
    * fixtures are all ASCII (filter is a no-op); if non-ASCII text ever
    * lands in the corpus it is excluded on BOTH sides instead of silently
    * diverging Spark (real payload bytes) from DuckDB (chars). */
  private def asciiDocs(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "documents")
      .where(octet_length(col("text")) === length(col("text")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_meta" -> { (s, dir) =>
      Multimodal.describe(
        Multimodal.pack(asciiDocs(s, dir), "doc_id", "text"))
        .select(col("media_id"), col("n_bytes"), col("content_md5"))
    },
    "mm_features" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.pack(asciiDocs(s, dir), "doc_id", "text")
        .as[MediaRecord]
      Multimodal.extractFeatures(s, media).toDF()
        .select(
          col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          col("byte_sum"))
    },
    "mm_resize" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.pack(asciiDocs(s, dir), "doc_id", "text")
        .as[MediaRecord]
      Multimodal.resize(s, media).toDF()
        .select(
          col("media_id"),
          col("n_bytes").as("out_bytes"),
          col("format"),
          md5(col("content")).as("content_md5"))
    },
    "mm_frame_sample" -> { (s, dir) =>
      Multimodal.frameSample(
        Multimodal.pack(asciiDocs(s, dir), "doc_id", "text"))
    })

  /** SQL twin of [[asciiDocs]]'s filter. */
  private val AsciiFilter = "octet_length(text::BLOB) = length(text)"

  def oracleSql: Map[String, String] = Map(
    "mm_media_meta" ->
      s"""SELECT doc_id AS media_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS content_md5
        |FROM documents WHERE $AsciiFilter""".stripMargin,
    // ASCII-only (enforced by the shared filter): byte values == codepoints.
    "mm_features" ->
      s"""SELECT doc_id AS media_id,
        |  octet_length(text::BLOB) % 640 AS width,
        |  octet_length(text::BLOB) % 480 AS height,
        |  1 + octet_length(text::BLOB) % 8 AS n_frames,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(unicode(c) AS BIGINT) FOR c IN list_filter(string_split(text, ''), x -> x != '')]),
        |    (a, b) -> a + b) AS BIGINT) AS byte_sum
        |FROM documents WHERE $AsciiFilter""".stripMargin,
    // Resize stub keeps every 2nd byte (ASCII-only: byte i == char i+1).
    "mm_resize" ->
      s"""SELECT doc_id AS media_id,
        |  CAST(ceil(octet_length(text::BLOB) / 2.0) AS BIGINT) AS out_bytes,
        |  'fake/raw;resize=1/2' AS format,
        |  md5(array_to_string(
        |    [substr(text, CAST(i AS INT), 1) FOR i IN range(1, octet_length(text::BLOB)+1, 2)],
        |    '')) AS content_md5
        |FROM documents WHERE $AsciiFilter""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH f AS (SELECT doc_id AS media_id,
        |    CAST(1 + octet_length(text::BLOB) % 8 AS BIGINT) AS n_frames
        |    FROM documents WHERE $AsciiFilter),
        |s AS (SELECT media_id, n_frames, unnest(range(0, 4)) AS i FROM f)
        |SELECT DISTINCT media_id, n_frames,
        |  CAST(floor(i * n_frames / 4) AS BIGINT) AS frame_no FROM s""".stripMargin)
}
