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
    },
    // REAL codec path (JDK imageio): synthetic grayscale PNGs seeded by
    // doc_id, decoded for actual dimensions + pixel sums. Lossless both
    // directions, so the oracle replays the pixel formula in closed form.
    "mm_image_features" -> { (s, dir) =>
      val media = Multimodal.synthImageMedia(
        s, Fixtures.table(s, dir, "documents").select(col("doc_id")))
      Multimodal.decodeImages(s, media).toDF()
        .select(
          col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("byte_sum"))
    },
    // encode -> decode -> nearest-neighbor 1/2 resize -> re-encode ->
    // decode: the resized image's pixels are exact picks from the
    // original grid, so the oracle sums formula(2x, 2y) over the
    // half-size grid.
    "mm_image_resize" -> { (s, dir) =>
      val media = Multimodal.synthImageMedia(
        s, Fixtures.table(s, dir, "documents").select(col("doc_id")))
      Multimodal.decodeImages(s, Multimodal.resizeImages(s, media, 2)).toDF()
        .select(
          col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("byte_sum"))
    },
    // Perceptual image dedup: REAL decode -> 8x8 nearest-neighbor aHash
    // (64-bit fingerprint) -> exact-hash grouping, the image-dedup
    // primitive of a multimodal pipeline. The hash is pure integer math
    // over exact pixel picks, so the oracle replays it bit for bit.
    "mm_image_phash" -> { (s, dir) =>
      val media = Multimodal.synthImageMedia(
        s, Fixtures.table(s, dir, "documents").select(col("doc_id")))
      val hashes = Multimodal.imageHashes(s, media).toDF()
      val groups = hashes.groupBy(col("phash")).agg(count(lit(1)).as("n_same_hash"))
      hashes.join(groups, "phash")
        .select(col("media_id"), col("phash"), col("n_same_hash"))
    },
    // Image NEAR-dup pairs: pigeonhole banding over the perceptual
    // hashes (4x16-bit bands — EXACT recall for hamming <= 3, not
    // probabilistic) + popcount verify. The scale path for image dedup:
    // band bucketing + candidate dedup, never an all-pairs product.
    "mm_image_neardup" -> { (s, dir) =>
      val media = Multimodal.synthImageMedia(
        s, Fixtures.table(s, dir, "documents").select(col("doc_id")))
      Multimodal.phashNearDupPairs(
        s, Multimodal.imageHashes(s, media).toDF()
          .select(col("media_id"), col("phash")),
        maxHamming = 3)
    },
    // REAL audio codec path (JDK javax.sound WAV stack): synthetic 16-bit
    // PCM clips seeded by doc_id, decoded for rate/length/sum/peak. PCM is
    // lossless, so the oracle replays the waveform formula in closed form.
    "mm_audio_features" -> { (s, dir) =>
      val media = Multimodal.synthAudioMedia(
        s, Fixtures.table(s, dir, "documents").select(col("doc_id")))
      Multimodal.decodeAudio(s, media)
        .select(
          col("media_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_samples"),
          col("sample_sum"),
          col("peak").cast("long").as("peak"))
    },
    // encode -> decode -> decimate by 2 -> re-encode -> decode: the
    // resampled clip's samples are exact picks from the original
    // (out(i) = in(2i)), so the oracle sums the formula over the
    // half-grid at half the rate.
    "mm_audio_resample" -> { (s, dir) =>
      val media = Multimodal.synthAudioMedia(
        s, Fixtures.table(s, dir, "documents").select(col("doc_id")))
      Multimodal.decodeAudio(s, Multimodal.resampleAudio(s, media, 2))
        .select(
          col("media_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_samples"),
          col("sample_sum"),
          col("peak").cast("long").as("peak"))
    },
    // ANTI-ALIASED 2:1 resample (edge-clamped half-band FIR [1,2,1]/4,
    // exact integer floor via the +32768 bias): the oracle replays the
    // convolution sample by sample inside the waveform formula.
    "mm_audio_resample_fir" -> { (s, dir) =>
      val media = Multimodal.synthAudioMedia(
        s, Fixtures.table(s, dir, "documents").select(col("doc_id")))
      Multimodal.decodeAudio(s, Multimodal.resampleAudioFir(s, media))
        .select(
          col("media_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_samples"),
          col("sample_sum"),
          col("peak").cast("long").as("peak"))
    })

  /** SQL twin of [[asciiDocs]]'s filter. */
  private val AsciiFilter = "octet_length(text::BLOB) = length(text)"

  /** Shared CTE chain replaying Multimodal.imageHashes + the pigeonhole
    * banding, ending in `ph(media_id, phash)` and `bands(media_id,
    * phash, b, bucket)` — the aHash in closed form (bits fold in
    * HUGEINT, wrap to the signed BIGINT Spark packs; band buckets mask
    * to 16 bits so DuckDB's arithmetic >> agrees with Spark's unsigned
    * shift). Used by mm_image_neardup and pipeline_image_index. */
  private[queries] val PhashBandCtes: String =
    """d AS (SELECT doc_id, 1 + doc_id % 31 AS w, 1 + doc_id % 17 AS h FROM documents),
      |gx AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS gx FROM d),
      |cells AS (SELECT doc_id, gy.gy * 8 + gx.gx AS j,
      |    (doc_id*31 + ((gx.gx * w) // 8) * 7 + ((gy.gy * h) // 8) * 13) % 256 AS p
      |  FROM gx CROSS JOIN (SELECT unnest(range(0, 8)) AS gy) gy),
      |sums AS (SELECT doc_id, sum(p) AS total FROM cells GROUP BY 1),
      |hs AS (SELECT c.doc_id,
      |    sum(CASE WHEN c.p * 64 > s.total
      |        THEN CAST(power(2, c.j) AS HUGEINT) ELSE 0::HUGEINT END) AS hraw
      |  FROM cells c JOIN sums s USING (doc_id) GROUP BY 1),
      |ph AS MATERIALIZED (SELECT doc_id AS media_id,
      |    CAST(CASE WHEN hraw >= 9223372036854775808::HUGEINT
      |         THEN hraw - 18446744073709551616::HUGEINT ELSE hraw END AS BIGINT) AS phash
      |  FROM hs),
      |bands AS MATERIALIZED (SELECT media_id, phash, b,
      |    (phash >> CAST(16 * b AS INT)) & 65535 AS bucket
      |  FROM ph CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs)""".stripMargin

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
        |  CAST(floor(i * n_frames / 4) AS BIGINT) AS frame_no FROM s""".stripMargin,
    // The real-codec queries replay Multimodal.pixelValue/synthWidth/
    // synthHeight as integer SQL: dims 1 + doc_id % {31,17}, pixel
    // (doc_id*31 + x*7 + y*13) % 256 — PNG is lossless, so the decoded
    // sums must equal the formula's exactly.
    "mm_image_features" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 31 AS w, 1 + doc_id % 17 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
        |SELECT doc_id AS media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sum((doc_id*31 + x*7 + y*13) % 256) AS BIGINT) AS byte_sum
        |FROM px GROUP BY 1, 2, 3""".stripMargin,
    // Nearest-neighbor 1/2 resize: out dims ceil(dim/2), out(x,y) =
    // in(2x, 2y) — the sum ranges over the half grid with doubled
    // coordinates inside the same pixel formula.
    "mm_image_resize" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 31 AS w, 1 + doc_id % 17 AS h FROM documents),
        |o AS (SELECT doc_id, (w + 1) // 2 AS ow, (h + 1) // 2 AS oh FROM d),
        |xs AS (SELECT doc_id, ow, oh, unnest(range(0, ow)) AS x FROM o),
        |px AS (SELECT doc_id, ow, oh, x, unnest(range(0, oh)) AS y FROM xs)
        |SELECT doc_id AS media_id, CAST(ow AS BIGINT) AS width, CAST(oh AS BIGINT) AS height,
        |  CAST(sum((doc_id*31 + (2*x)*7 + (2*y)*13) % 256) AS BIGINT) AS byte_sum
        |FROM px GROUP BY 1, 2, 3""".stripMargin,
    // The aHash replayed in closed form: 8x8 grid cell (gx, gy) samples
    // pixel (gx*w//8, gy*h//8); bit j = gy*8+gx set iff pixel*64 >
    // sum-of-64-samples; bits fold in HUGEINT (DuckDB refuses BIGINT
    // 1<<63) and wrap to the signed two's-complement BIGINT Spark packs.
    "mm_image_phash" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 31 AS w, 1 + doc_id % 17 AS h FROM documents),
        |gx AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS gx FROM d),
        |cells AS (SELECT doc_id, gy.gy * 8 + gx.gx AS j,
        |    (doc_id*31 + ((gx.gx * w) // 8) * 7 + ((gy.gy * h) // 8) * 13) % 256 AS p
        |  FROM gx CROSS JOIN (SELECT unnest(range(0, 8)) AS gy) gy),
        |sums AS (SELECT doc_id, sum(p) AS total FROM cells GROUP BY 1),
        |hs AS (SELECT c.doc_id,
        |    sum(CASE WHEN c.p * 64 > s.total
        |        THEN CAST(power(2, c.j) AS HUGEINT) ELSE 0::HUGEINT END) AS hraw
        |  FROM cells c JOIN sums s USING (doc_id) GROUP BY 1),
        |ph AS (SELECT doc_id AS media_id,
        |    CAST(CASE WHEN hraw >= 9223372036854775808::HUGEINT
        |         THEN hraw - 18446744073709551616::HUGEINT ELSE hraw END AS BIGINT) AS phash
        |  FROM hs),
        |grp AS (SELECT phash, CAST(count(*) AS BIGINT) AS n_same_hash FROM ph GROUP BY 1)
        |SELECT ph.media_id, ph.phash, grp.n_same_hash
        |FROM ph JOIN grp USING (phash)""".stripMargin,
    // Near-dup: the same phash CTE, then BANDED candidates (the oracle
    // replays the pigeonhole banding rather than the quadratic product,
    // so it stays cheap at any sf; the two are equal by pigeonhole for
    // hamming <= 3) + popcount verify. Band buckets mask to 16 bits, so
    // DuckDB's arithmetic >> agrees with Spark's unsigned shift.
    "mm_image_neardup" ->
      s"""WITH $PhashBandCtes,
        |bok AS (SELECT b, bucket FROM bands GROUP BY 1, 2
        |  HAVING count(*) <= ${graft.operators.LshBuckets.MaxBucket}),
        |cand AS (SELECT DISTINCT a.media_id AS id_a, b2.media_id AS id_b,
        |    a.phash AS ph_a, b2.phash AS ph_b
        |  FROM bands a JOIN bands b2
        |    ON a.b = b2.b AND a.bucket = b2.bucket AND a.media_id < b2.media_id
        |  JOIN bok ON bok.b = a.b AND bok.bucket = a.bucket)
        |SELECT id_a, id_b, CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 3""".stripMargin,
    // The real-codec audio queries replay Multimodal.sampleValue/
    // synthSampleRate/synthSampleCount as integer SQL: rate
    // 8000 + 1000*(doc_id % 5), n 50 + doc_id % 200, sample(i) =
    // (doc_id*17 + i*29) % 20001 - 10000 — PCM WAV is lossless, so the
    // decoded stats must equal the formula's exactly.
    "mm_audio_features" ->
      """WITH d AS (SELECT doc_id, 8000 + 1000*(doc_id % 5) AS rate, 50 + doc_id % 200 AS n
        |  FROM documents),
        |s AS (SELECT doc_id, rate, n, unnest(range(0, n)) AS i FROM d)
        |SELECT doc_id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum((doc_id*17 + i*29) % 20001 - 10000) AS BIGINT) AS sample_sum,
        |  CAST(max(abs((doc_id*17 + i*29) % 20001 - 10000)) AS BIGINT) AS peak
        |FROM s GROUP BY 1, 2, 3""".stripMargin,
    // Decimation by 2: out(i) = in(2i), ceil(n/2) samples at rate/2 — the
    // sum ranges over the half grid with doubled indices inside the same
    // waveform formula.
    "mm_audio_resample" ->
      """WITH d AS (SELECT doc_id, (8000 + 1000*(doc_id % 5)) // 2 AS rate,
        |    (50 + doc_id % 200 + 1) // 2 AS n FROM documents),
        |s AS (SELECT doc_id, rate, n, unnest(range(0, n)) AS i FROM d)
        |SELECT doc_id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum((doc_id*17 + (2*i)*29) % 20001 - 10000) AS BIGINT) AS sample_sum,
        |  CAST(max(abs((doc_id*17 + (2*i)*29) % 20001 - 10000)) AS BIGINT) AS peak
        |FROM s GROUP BY 1, 2, 3""".stripMargin,
    // Half-band FIR replay: out(i) = ((v(2i-1) + 2*v(2i) + v(2i+1) +
    // 131072) // 4) - 32768 with edge-clamped taps — the biased
    // numerator is non-negative, so DuckDB's integer // and the JVM's
    // >> 2 floor identically. v(j) is the same waveform formula.
    "mm_audio_resample_fir" ->
      """WITH d AS (SELECT doc_id, (8000 + 1000*(doc_id % 5)) // 2 AS rate,
        |    50 + doc_id % 200 AS src_n, (50 + doc_id % 200 + 1) // 2 AS n
        |  FROM documents),
        |s AS (SELECT doc_id, rate, src_n, n, unnest(range(0, n)) AS i FROM d),
        |t AS (SELECT doc_id, rate, n,
        |    (doc_id*17 + greatest(2*i - 1, 0)*29) % 20001 - 10000 AS va,
        |    (doc_id*17 + (2*i)*29) % 20001 - 10000 AS vb,
        |    (doc_id*17 + least(2*i + 1, src_n - 1)*29) % 20001 - 10000 AS vc
        |  FROM s),
        |o AS (SELECT doc_id, rate, n,
        |    ((va + 2*vb + vc + 131072) // 4) - 32768 AS v FROM t)
        |SELECT doc_id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sample_sum,
        |  CAST(max(abs(v)) AS BIGINT) AS peak
        |FROM o GROUP BY 1, 2, 3""".stripMargin)
}
