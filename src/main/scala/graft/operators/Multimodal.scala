package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque payload bytes + typed metadata — the pattern for
  * carrying images/audio/video through a 100 TB pipeline as binary columns
  * with schema'd sidecar fields. */
case class MediaRecord(
    media_id: Long,
    content: Array[Byte],
    format: String,
    n_bytes: Long)

/** Deterministic stand-in for decoded media features (real decoders are
  * not available in this environment; the Spark-side plumbing — schema,
  * batching, partitioning — is real). */
case class MediaFeatures(
    media_id: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    byte_sum: Long)

/**
 * Multimodal-column operators. Media payloads stay opaque `binary` columns
 * end to end; decode/feature-extraction runs batched per partition (the
 * Scala analog of a batched pandas UDF): partitions stream through a
 * batch-at-a-time iterator so a real decoder could amortize model/library
 * setup per batch without materializing a partition in memory.
 */
object Multimodal {

  val BatchSize = 64

  /** Pack any table into media records: payload = utf8 bytes of a text
    * column (stands in for image/audio bytes). */
  def pack(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      lit("fake/raw").as("format"),
      octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"))

  /** Cheap metadata pass — runs fully in codegen, no decode. */
  def describe(df: DataFrame): DataFrame =
    df.select(
      col("media_id"),
      col("n_bytes"),
      md5(col("content")).as("content_md5"))

  /**
   * Batched "decode" + feature extraction. STUB decoder: features are
   * deterministic functions of the payload bytes (a real implementation
   * would replace `decodeBatch` with an image/audio library call; the
   * batching, schema and distribution are what this operator fixes).
   */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(decodeBatch)
    }
  }

  /** STUB: one batch through the "decoder". Deterministic fake features:
    * width/height derived from payload length, byte_sum as the "content". */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.content.length) { sum += r.content(i) & 0xff; i += 1 }
      MediaFeatures(
        media_id = r.media_id,
        width = (r.n_bytes % 640).toInt,
        height = (r.n_bytes % 480).toInt,
        n_frames = 1 + (r.n_bytes % 8).toInt,
        byte_sum = sum)
    }
}
