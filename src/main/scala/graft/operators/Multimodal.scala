package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** The stub media model's frame count — ONE definition, used by the
    * batched decoder (scalar) and the codegen'd frame sampler (column),
    * so the two paths (and their oracles) cannot drift. */
  def frameCount(nBytes: Long): Int = 1 + (nBytes % 8).toInt
  def frameCountCol(nBytes: Column): Column =
    (lit(1) + pmod(nBytes, lit(8L))).cast("int")

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
        n_frames = frameCount(r.n_bytes),
        byte_sum = sum)
    }

  /**
   * Batched "resize": dimensions divide by `factor`, payload keeps every
   * `factor`-th byte. STUB transform (a real one calls an image library in
   * `resizeBatch`), but the pipeline shape is the production one: binary
   * in, binary out, constant memory per batch, output is a first-class
   * media Dataset that downstream operators (describe / extractFeatures /
   * frameSample) consume unchanged.
   */
  def resize(spark: SparkSession, media: Dataset[MediaRecord], factor: Int = 2): Dataset[MediaRecord] = {
    import spark.implicits._
    require(factor >= 1, "resize factor must be >= 1")
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(b => resizeBatch(b, factor))
    }
  }

  /** STUB: one batch through the "resizer". */
  private def resizeBatch(batch: Seq[MediaRecord], factor: Int): Seq[MediaRecord] =
    batch.map { r =>
      val out = new Array[Byte]((r.content.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = r.content(i * factor); i += 1 }
      MediaRecord(
        media_id = r.media_id,
        content = out,
        format = s"${r.format};resize=1/$factor",
        n_bytes = out.length.toLong)
    }

  /**
   * Frame sampling for video-like payloads: emit up to `k` evenly spaced
   * frame indices out of the item's `n_frames` (`floor(i * n_frames / k)`,
   * deduplicated — short clips yield fewer samples). Pure codegen — frame
   * *selection* is arithmetic on metadata and never touches payload bytes;
   * only the chosen frames would be decoded downstream (by
   * [[extractFeatures]]-style batches), which is the point at 100 TB:
   * sample first, decode after.
   */
  def frameSample(media: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1, "frameSample k must be >= 1")
    media
      .select(
        col("media_id"),
        frameCountCol(col("n_bytes")).as("n_frames"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .select(
        col("media_id"),
        col("n_frames").cast("long").as("n_frames"),
        floor(col("i") * col("n_frames") / k).cast("long").as("frame_no"))
      .distinct()
  }
}
