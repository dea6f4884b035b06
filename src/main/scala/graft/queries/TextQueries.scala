package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Packing, Ranking, TextAnalysis}

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
    // RAG-unit chunking: 32-token windows, 8-token overlap (stride 24) —
    // shuffle-free per-row array math; the oracle replays the window
    // arithmetic and the rejoined chunk text verbatim.
    "text_chunks" -> { (s, dir) =>
      TextAnalysis.chunkDocuments(
        Fixtures.table(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 32, overlapTokens = 8)
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
    // CCNet-style LM quality score: fixed-point average smoothed bigram
    // probability under a model trained on the % LmTrainMod != 0 slice;
    // integer math end to end so the oracle replays it bit-for-bit.
    "text_lm_score" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      TextAnalysis.lmScore(
        docs, docs.where(col("doc_id") % LmTrainMod =!= 0),
        "doc_id", "text", LmMaxGrams, LmVocab, LmScale)
    },
    // CCNet head/middle/tail: exact 3-quantile banding of the LM scores
    // via the distributed global rank (never a one-task global window).
    "text_lm_bands" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      Ranking.bands(
        TextAnalysis.lmScore(
          docs, docs.where(col("doc_id") % LmTrainMod =!= 0),
          "doc_id", "text", LmMaxGrams, LmVocab, LmScale),
        Seq("lm_score_fp", "doc_id"), LmBands)
    },
    // Test-set decontamination: the deterministic doc_id % 23 == 0 slice
    // stands in for a benchmark; every other doc is checked for word
    // 3-gram containment against it.
    "text_decontam" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      TextAnalysis.decontaminate(
        docs.where(col("doc_id") % BenchMod =!= 0),
        docs.where(col("doc_id") % BenchMod === 0),
        "doc_id", "text", DecontamN)
    },
    // Concat-and-chunk sequence packing: per-doc chunk spans under a
    // fixed token budget via the distributed two-phase prefix sum.
    "text_packing" -> { (s, dir) =>
      Packing.chunkSpans(
        Fixtures.table(s, dir, "documents"),
        "doc_id", TextAnalysis.wsTokenCount(col("text")), PackBudget)
    },
    // Packing-efficiency dashboard numbers over the same spans.
    "text_packing_stats" -> { (s, dir) =>
      Packing.packingStats(Packing.chunkSpans(
        Fixtures.table(s, dir, "documents"),
        "doc_id", TextAnalysis.wsTokenCount(col("text")), PackBudget))
    },
    // Gopher-style intra-document repetition signals.
    "text_repetition" -> { (s, dir) =>
      TextAnalysis.repetitionReport(
        Fixtures.table(s, dir, "documents"), "doc_id", "text")
    },
    // Contact-info scrubbing: the fixture corpus has no PII, so both
    // sides plant deterministic contacts on doc_id % 7 == 0 and the
    // report must count and redact them identically (the scrub_fp
    // fingerprint pins the redacted TEXT, not just the counts).
    "text_scrub" -> { (s, dir) =>
      val planted = Fixtures.table(s, dir, "documents").withColumn(
        "text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact team+ops@example-corp.io or https://data.example.org/set?id="),
            col("doc_id").cast("string")))
          .otherwise(col("text")))
      TextAnalysis.scrubReport(planted, "doc_id", "text")
    },
    // Full PII class set (email, URL, phone in two dialects, IPv4):
    // deterministic plants per id residue, counts + the ordered-redaction
    // fingerprint checked across engines.
    "text_scrub_pii" -> { (s, dir) =>
      val d = col("doc_id")
      val planted = Fixtures.table(s, dir, "documents").withColumn(
        "text",
        concat(
          col("text"),
          when(d % 7 === 0,
            concat(lit(" contact team+ops@example-corp.io or https://data.example.org/set?id="),
              d.cast("string"))).otherwise(lit("")),
          when(d % 10 === 0,
            concat(lit(" dial +1-202-555-"), lpad((d % 10000).cast("string"), 4, "0")))
            .when(d % 5 === 0,
              concat(lit(" call (650) 555."), lpad((d % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(d % 11 === 0,
            concat(lit(" from 10.0."), (d % 256).cast("string"), lit(".77")))
            .otherwise(lit(""))))
      TextAnalysis.scrubPiiReport(planted, "doc_id", "text")
    },
    // Paragraph-level keep-first dedup (RefinedWeb/CCNet step): shared
    // paragraphs planted per id residue — %12 docs carry an IN-DOC
    // repeat too, exercising the within-document drop.
    "text_para_dedup" -> { (s, dir) =>
      val d = col("doc_id")
      val alpha = "shared paragraph alpha about corpus hygiene and dedup pipelines"
      val beta = "shared paragraph beta with licensing boilerplate and notices"
      val planted = Fixtures.table(s, dir, "documents").withColumn(
        "text",
        concat_ws("\n\n",
          col("text"),
          when(d % 3 === 0, lit(alpha)),
          when(d % 4 === 0, lit(beta)),
          when(d % 12 === 0, lit(alpha))))
      TextAnalysis.paragraphDedup(planted, "doc_id", "text")
    },
    // URL/domain blocklist gate (UT1/C4 provenance filtering): the
    // fixture corpus has no URL column, so the query PLANTS one (the
    // text_scrub pattern) with userinfo, port and query noise the host
    // extraction must strip, mixed case the normalization must fold, and
    // subdomain nesting only suffix-chain matching catches.
    "text_url_filter" -> { (s, dir) =>
      val d = col("doc_id")
      val host = when(d % 6 === 0, lit("ads.Tracker-Example.com"))
        .when(d % 7 === 0, lit("malware.bad-example.net"))
        .when(d % 5 === 0, lit("www.docs.example.org"))
        .otherwise(lit("docs.example.org"))
      val planted = Fixtures.table(s, dir, "documents")
        .withColumn("url",
          concat(lit("https://user:pw@"), host, lit(":8080/page/"),
            d.cast("string"), lit("?ref=x")))
      TextAnalysis.urlBlocklistFilter(planted, "doc_id", "url", UrlBlocklist)
    },
    // DSIR importance weighting + deterministic top-k selection: the
    // doc_id % 9 == 0 slice stands in for the target (reference) set,
    // everything else is the raw corpus being selected from.
    "text_dsir" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      // weights feed two consumers (the top-k and the selected join) —
      // materialize the (id, n_grams, weight) rows once or each consumer
      // re-runs the whole fit+score pipeline (stage stats r16: the score
      // aggregation executed twice; AQE reuse is not transitive)
      val weights = TextAnalysis.dsirWeights(
        docs.where(col("doc_id") % DsirTargetMod =!= 0),
        docs.where(col("doc_id") % DsirTargetMod === 0),
        "doc_id", "text", DsirBuckets, DsirScale)
        .localCheckpoint(true)
      val top = weights
        .orderBy(col("dsir_weight_fp").desc, col("doc_id"))
        .limit(DsirTopK)
        .select(col("doc_id"), lit(1).as("selected"))
      weights.join(top, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("n_grams"), col("dsir_weight_fp"),
          coalesce(col("selected"), lit(0)).as("selected"))
    },
    // Feature-hashed document embeddings (the hashing trick): word
    // unigram+bigram grams hashed into 64 signed cells by the engine's
    // md5 routing — the model-free text→vector bridge into the
    // similarity stack. Sparse (doc, cell, w) form; integer signed
    // counts, fully replayed by the oracle (cell AND sign hash).
    "text_hash_embed" -> { (s, dir) =>
      TextAnalysis.featureHashEmbed(
        Fixtures.table(s, dir, "documents"), "doc_id", "text", HashEmbedDim)
        .select(col("doc_id"), col("cell").cast("long").as("cell"), col("w"))
    },
    // Stratified rebalancing: keep all short docs, half the mid band,
    // a quarter of the long band — deterministic md5-bucket membership.
    "samp_stratified" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      val band = when(length(col("text")) < 200, "short")
        .when(length(col("text")) < 400, "mid")
        .otherwise("long")
      graft.operators.Sampling.stratifiedSample(
        docs.withColumn("band", band), "doc_id", col("band"),
        Seq("short" -> 1000, "mid" -> 500, "long" -> 250), defaultRate = 0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
    },
    // Deterministic md5-bucket train/valid/test split (98/1/1 per-mille
    // 980/10/10): same id -> same split in any engine, forever.
    "samp_split_counts" -> { (s, dir) =>
      graft.operators.Sampling.split(
        Fixtures.table(s, dir, "documents"), "doc_id",
        Seq("train" -> 980, "valid" -> 10, "test" -> 10))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
    },
    // Token-budget corpus mixing (the pretraining "data recipe"): sample
    // each source so its kept tokens hit its per-mille share of the
    // budget; a source with fewer tokens than its target keeps everything
    // (src0's 400-per-mille share of 25k chars exceeds its sf0.01
    // availability -> rate caps at 1000). Long math end to end, so the
    // oracle replays rates exactly.
    "samp_token_mix" -> { (s, dir) =>
      graft.operators.Sampling.tokenBudgetMix(
        Fixtures.table(s, dir, "documents"),
        "doc_id", "source", col("n_chars"), MixWeights, MixBudget)
        .select(col("doc_id"), col("source"))
    },
    // Temperature (α=1/2) source rebalancing to a row budget: weights =
    // ieeeIsqrt(per-source count), targets/rates all integer floor math,
    // selection by the same md5 per-mille buckets as every sampler here —
    // the whole chain (counts → isqrt → targets → rates → membership)
    // replays in the oracle.
    "samp_alpha_mix" -> { (s, dir) =>
      graft.operators.Sampling.alphaMix(
        Fixtures.table(s, dir, "documents"), "doc_id", "source",
        AlphaMixBudget, halfPow = 1)
        .select(col("doc_id"), col("source"))
    },
    // Seed-keyed exact global permutation (epoch reshuffle): every doc's
    // position under order-by md5(seed:id), id tiebreak — computed with
    // the distributed two-phase prefix sum, verified against DuckDB's
    // row_number() over the same ordering.
    "samp_epoch_shuffle" -> { (s, dir) =>
      graft.operators.Sampling.globalShuffle(
        Fixtures.table(s, dir, "documents"), "doc_id", ShuffleSeed)
    },
    // C4-style boilerplate-line removal. The fixture corpus is single-line
    // and line-unique, so the query PLANTS the boilerplate it removes (the
    // text_scrub pattern): a cookie banner on doc_id % 3, a footer on
    // doc_id % 4, and a doc-unique "rare line" on doc_id % 5 that must
    // survive. BoilerMinDocs = 20: banners/footers cross it, rare lines
    // never do; the oracle replants identically and replays the filter.
    "text_boilerplate" -> { (s, dir) =>
      val planted = Fixtures.table(s, dir, "documents").withColumn("text",
        concat(
          when(col("doc_id") % 3 === 0, lit("accept all cookies to continue\n"))
            .otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 4 === 0, lit("\ncopyright example site all rights reserved"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit("\nrare line "), col("doc_id").cast("string")))
            .otherwise(lit(""))))
      TextAnalysis.boilerplateRemoval(planted, "doc_id", "text", BoilerMinDocs)
    })

  val BenchMod = 23
  val DecontamN = 3
  // LM quality score: train on the doc_id % LmTrainMod != 0 slice (the
  // "reference corpus"), score everything. MaxGrams binds at sf0.01 so
  // the deterministic-eviction path is exercised, not just declared.
  val LmTrainMod = 5
  // DSIR: target = doc_id % 9 == 0 slice; 4096 hashed cells (a power of
  // two, so the md5-mod bucket replays as low-bits in SQL); 2^20
  // fixed-point scale; select the top 100 by weight.
  val UrlBlocklist = Seq("tracker-example.com", "bad-example.net", "example.biz")
  val DsirTargetMod = 9
  val DsirBuckets = 4096
  val DsirScale = 1L << 20
  val DsirTopK = 100
  val LmMaxGrams = 4096
  val LmVocab = 65536L
  /** Feature-hash embedding width — POWER OF TWO so the oracle's
    * simplified md5 routing (low-8-bytes % n == full signed-BigInteger
    * shard_index when n | 2^64) applies, the DSIR-bucket precedent. */
  val HashEmbedDim = 64
  val LmScale = 1000000L
  val LmBands = 3
  val PackBudget = 128L
  val MixWeights = Seq("src0" -> 400, "src1" -> 300, "src2" -> 200, "src3" -> 100)
  val MixBudget = 25000L
  val AlphaMixBudget = 120L
  val ShuffleSeed = 7L
  val BoilerMinDocs = 20

  private val stopSet = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** The rolling-hash fingerprint of `expr` in DuckDB SQL — the one
    * definition shared by text_fingerprint and text_scrub (a drifted
    * copy would only fail when the fixture happens to exercise it). */
  private def fpSql(expr: String): String =
    s"""list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      [CAST(unicode(c) AS BIGINT) FOR c IN list_filter(string_split($expr, ''), x -> x != '')]),
       |    (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  private[queries] def occSql(m: String): String =
    s"CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' $m ', ''))) / ${m.length + 2} AS BIGINT)"

  private[queries] def scoreSql(lang: String): String =
    TextAnalysis.LangMarkers.toMap.apply(lang).map(occSql).mkString(" + ")

  /** CTE chain replaying [[graft.operators.TextAnalysis.lmScore]] — the
    * final `scores` CTE is (doc_id, n_bigrams, lm_score_fp); shared by the
    * score and banding oracles so their score math cannot drift. sum()
    * must cast back to BIGINT (DuckDB widens to HUGEINT). */
  private def lmScoreCtes: String =
    s"""toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
       |tg AS (SELECT doc_id,
       |    unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]) AS g
       |  FROM toks WHERE len(t) >= 2),
       |c2 AS (SELECT g, count(*) AS c2 FROM tg WHERE doc_id % $LmTrainMod != 0 GROUP BY 1),
       |c2cap AS (SELECT g, c2 FROM
       |  (SELECT g, c2, row_number() OVER (ORDER BY c2 DESC, g) AS rn FROM c2)
       |  WHERE rn <= $LmMaxGrams),
       |c1 AS (SELECT w, count(*) AS c1 FROM
       |    (SELECT unnest(t) AS w FROM toks WHERE doc_id % $LmTrainMod != 0)
       |  GROUP BY 1),
       |c1cap AS (SELECT w, c1 FROM
       |  (SELECT w, c1, row_number() OVER (ORDER BY c1 DESC, w) AS rn FROM c1)
       |  WHERE rn <= $LmMaxGrams),
       |probe AS (SELECT tg.doc_id,
       |    ((coalesce(c2cap.c2, 0) + 1) * $LmScale) // (coalesce(c1cap.c1, 0) + $LmVocab) AS p_fp
       |  FROM tg
       |  LEFT JOIN c2cap ON c2cap.g = tg.g
       |  LEFT JOIN c1cap ON c1cap.w = split_part(tg.g, ' ', 1)),
       |agg AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(p_fp) AS BIGINT) AS p_sum
       |  FROM probe GROUP BY 1),
       |scores AS (SELECT d.doc_id,
       |  coalesce(a.n_bigrams, 0) AS n_bigrams,
       |  CAST(coalesce(a.p_sum // a.n_bigrams, 0) AS BIGINT) AS lm_score_fp
       |FROM documents d LEFT JOIN agg a USING (doc_id))""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\S+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens
        |FROM documents""".stripMargin,
    // chunk = 32, overlap = 8, stride = 24; integer-ceil chunk count,
    // 1-based inclusive list_slice == Spark's slice(arr, start, len)
    "text_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t
        |  WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks, n,
        |    greatest(1, (n - 8 + 23) // 24) AS n_chunks FROM d),
        |e AS (
        |  SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_no FROM c)
        |SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
        |  CAST(chunk_no * 24 AS BIGINT) AS start_tok,
        |  CAST(len(list_slice(toks, CAST(chunk_no * 24 + 1 AS INT),
        |    CAST(chunk_no * 24 + 32 AS INT))) AS BIGINT) AS n_tok,
        |  array_to_string(list_slice(toks, CAST(chunk_no * 24 + 1 AS INT),
        |    CAST(chunk_no * 24 + 32 AS INT)), ' ') AS chunk_text
        |FROM e""".stripMargin,
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
      s"""SELECT doc_id, ${fpSql("text")} AS fp
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
    // LM-score replay: bigram/prefix counts from the train slice, capped
    // by the same (count DESC, gram) rule, Laplace fixed-point integer
    // division (DuckDB // == Spark div on non-negative BIGINTs), per-doc
    // average.
    "text_lm_score" ->
      s"""WITH $lmScoreCtes
         |SELECT doc_id, n_bigrams, lm_score_fp FROM scores""".stripMargin,
    // Bands on top of the same score CTEs: rank = row_number - 1 over the
    // identical (score, id) total order; band = (rank * n) // N + 1 — the
    // even-remainder split Ranking.bands computes distributed.
    "text_lm_bands" ->
      s"""WITH $lmScoreCtes,
         |r AS (SELECT doc_id, n_bigrams, lm_score_fp,
         |    row_number() OVER (ORDER BY lm_score_fp, doc_id) - 1 AS rnk,
         |    count(*) OVER () AS n
         |  FROM scores)
         |SELECT doc_id, n_bigrams, lm_score_fp,
         |  CAST(rnk AS BIGINT) AS rank,
         |  CAST((rnk * $LmBands) // n + 1 AS BIGINT) AS band
         |FROM r""".stripMargin,
    // Word 3-gram containment against the doc_id % 23 == 0 "benchmark".
    "text_decontam" ->
      s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
         |grams AS (SELECT doc_id,
         |    unnest([array_to_string(t[i:i+${DecontamN - 1}], ' ') FOR i IN range(1, len(t) - ${DecontamN - 2})]) AS g
         |  FROM toks WHERE len(t) >= $DecontamN),
         |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % $BenchMod = 0),
         |cg AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % $BenchMod != 0),
         |hits AS (SELECT cg.doc_id, count(*) AS n_hits FROM cg JOIN bench USING (g) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(h.n_hits, 0) AS n_hits,
         |  CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $BenchMod != 0) d
         |LEFT JOIN hits h USING (doc_id)""".stripMargin,
    // Global running token total ordered by doc_id; // is DuckDB's
    // integer floor division, twin of Spark's `div`.
    "text_packing" ->
      s"""WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents),
         |p AS (SELECT doc_id, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t WHERE n_tokens > 0)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS first_chunk,
         |  CAST((cum - 1) // $PackBudget AS BIGINT) AS last_chunk
         |FROM p""".stripMargin,
    "text_packing_stats" ->
      s"""WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents),
         |p AS (SELECT doc_id, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t WHERE n_tokens > 0),
         |spans AS (SELECT doc_id, n_tokens,
         |    (cum - n_tokens) // $PackBudget AS first_chunk,
         |    (cum - 1) // $PackBudget AS last_chunk
         |  FROM p)
         |SELECT count(*) AS n_docs,
         |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total_tokens,
         |  CAST(coalesce(max(last_chunk) + 1, 0) AS BIGINT) AS n_chunks,
         |  CAST(coalesce(sum(CASE WHEN last_chunk > first_chunk THEN 1 ELSE 0 END), 0) AS BIGINT) AS straddling_docs
         |FROM spans""".stripMargin,
    "text_repetition" ->
      """WITH b AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |g AS (SELECT doc_id, t,
        |    CASE WHEN len(t) >= 2 THEN [array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))] ELSE [] END AS bi,
        |    CASE WHEN len(t) >= 3 THEN [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)] ELSE [] END AS tri
        |  FROM b)
        |SELECT doc_id,
        |  CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(len(t) - len(list_distinct(t)) AS BIGINT) AS dup_token_cnt,
        |  CAST(len(tri) - len(list_distinct(tri)) AS BIGINT) AS dup_trigram_cnt,
        |  CAST(coalesce(list_max([len(list_filter(bi, x -> x = gd)) FOR gd IN list_distinct(bi)]), 0) AS BIGINT) AS top_bigram_cnt,
        |  CAST(len(bi) AS BIGINT) AS n_bigrams,
        |  CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1) AS dup_token_frac,
        |  CAST(coalesce(list_max([len(list_filter(bi, x -> x = gd)) FOR gd IN list_distinct(bi)]), 0) AS DOUBLE)
        |    / greatest(len(bi), 1) AS top_bigram_frac
        |FROM g""".stripMargin,
    "text_scrub" -> {
      // the operator's OWN patterns, interpolated — never re-declared
      val email = TextAnalysis.EmailRe
      val url = TextAnalysis.UrlRe
      s"""WITH planted AS (SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0
         |      THEN text || ' contact team+ops@example-corp.io or https://data.example.org/set?id=' || CAST(doc_id AS VARCHAR)
         |      ELSE text END AS text
         |  FROM documents),
         |s AS (SELECT doc_id,
         |    len(regexp_extract_all(text, '$email')) AS n_emails,
         |    len(regexp_extract_all(text, '$url')) AS n_urls,
         |    regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g') AS scrubbed
         |  FROM planted)
         |SELECT doc_id, n_emails, n_urls,
         |  ${fpSql("scrubbed")} AS scrub_fp
         |FROM s""".stripMargin
    },
    "text_scrub_pii" -> {
      val email = TextAnalysis.EmailRe
      val url = TextAnalysis.UrlRe
      val phone = TextAnalysis.PhoneRe
      val ip = TextAnalysis.Ipv4Re
      s"""WITH planted AS (SELECT doc_id,
         |    text
         |    || CASE WHEN doc_id % 7 = 0
         |         THEN ' contact team+ops@example-corp.io or https://data.example.org/set?id=' || CAST(doc_id AS VARCHAR)
         |         ELSE '' END
         |    || CASE WHEN doc_id % 10 = 0
         |         THEN ' dial +1-202-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |         WHEN doc_id % 5 = 0
         |         THEN ' call (650) 555.' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |         ELSE '' END
         |    || CASE WHEN doc_id % 11 = 0
         |         THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.77'
         |         ELSE '' END AS text
         |  FROM documents),
         |s AS (SELECT doc_id,
         |    len(regexp_extract_all(text, '$email')) AS n_emails,
         |    len(regexp_extract_all(text, '$url')) AS n_urls,
         |    len(regexp_extract_all(text, '$phone')) AS n_phones,
         |    len(regexp_extract_all(text, '$ip')) AS n_ips,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         |      '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g'),
         |      '$phone', '<PHONE>', 'g'), '$ip', '<IP>', 'g') AS scrubbed
         |  FROM planted)
         |SELECT doc_id, n_emails, n_urls, n_phones, n_ips,
         |  ${fpSql("scrubbed")} AS scrub_fp
         |FROM s""".stripMargin
    },
    "text_para_dedup" -> {
      val alpha = "shared paragraph alpha about corpus hygiene and dedup pipelines"
      val beta = "shared paragraph beta with licensing boilerplate and notices"
      s"""WITH planted AS (SELECT doc_id,
         |    concat_ws(chr(10)||chr(10), text,
         |      CASE WHEN doc_id % 3 = 0 THEN '$alpha' END,
         |      CASE WHEN doc_id % 4 = 0 THEN '$beta' END,
         |      CASE WHEN doc_id % 12 = 0 THEN '$alpha' END) AS text
         |  FROM documents),
         |p0 AS (SELECT doc_id,
         |    list_transform(regexp_split_to_array(text, '\\n{2,}'),
         |      (x, i) -> struct_pack(pos := i, para := trim(x))) AS ps
         |  FROM planted),
         |p1 AS (SELECT doc_id, unnest(ps) AS s FROM p0),
         |paras AS (SELECT doc_id, s.pos AS pos, s.para AS para FROM p1 WHERE s.para != ''),
         |r AS (SELECT doc_id, pos, para,
         |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
         |  FROM paras),
         |kept AS (SELECT doc_id, pos, para FROM r WHERE rn = 1),
         |asm AS (SELECT doc_id,
         |    string_agg(para, chr(10)||chr(10) ORDER BY pos) AS clean_text,
         |    count(*) AS kept_n
         |  FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, count(*) AS total_n FROM paras GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
         |  CAST(coalesce(t.total_n, 0) - coalesce(a.kept_n, 0) AS BIGINT) AS n_dropped
         |FROM documents d
         |LEFT JOIN tot t USING (doc_id) LEFT JOIN asm a USING (doc_id)""".stripMargin
    },
    // URL blocklist replay: identical plant, host regex, suffix-chain
    // expansion and min-rule tie-break. `hosts` is referenced twice ->
    // MATERIALIZED (the CTE-inlining doubling trap).
    "text_url_filter" -> {
      val rules = UrlBlocklist.map(r => s"'$r'").mkString(", ")
      s"""WITH p AS (SELECT doc_id,
         |    CASE WHEN doc_id % 6 = 0 THEN 'ads.Tracker-Example.com'
         |         WHEN doc_id % 7 = 0 THEN 'malware.bad-example.net'
         |         WHEN doc_id % 5 = 0 THEN 'www.docs.example.org'
         |         ELSE 'docs.example.org' END AS h
         |  FROM documents),
         |u AS (SELECT doc_id,
         |    'https://user:pw@' || h || ':8080/page/' || doc_id || '?ref=x' AS url FROM p),
         |hosts AS MATERIALIZED (SELECT doc_id,
         |    lower(regexp_extract(url,
         |      '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+).*$$', 1)) AS host
         |  FROM u),
         |sfx AS (SELECT doc_id,
         |    unnest([array_to_string(parts[i:], '.') FOR i IN range(1, len(parts) + 1)]) AS rule
         |  FROM (SELECT doc_id, string_split(host, '.') AS parts FROM hosts)),
         |m AS (SELECT doc_id, min(rule) AS matched_rule
         |  FROM sfx WHERE rule IN ($rules) GROUP BY doc_id)
         |SELECT h.doc_id, h.host,
         |  CAST(CASE WHEN m.matched_rule IS NOT NULL THEN 1 ELSE 0 END AS INT) AS blocked,
         |  m.matched_rule
         |FROM hosts h LEFT JOIN m USING (doc_id)""".stripMargin
    },
    // DSIR replay: same unigram+bigram extraction as decontam/lm_score,
    // buckets via the engine's md5-mod routing — 4096 divides 2^64, so
    // BigInteger(md5).mod(4096) is just the low 64 bits mod 4096 (the
    // signed-high-half correction multiplies by 2^64 mod 4096 = 0).
    // Laplace fixed-point integer division on both cell models, weight =
    // sum of probability differences, top-k by (weight DESC, id).
    // Multi-referenced CTEs are MATERIALIZED (inlining doubles the
    // expansion per reference — the Too-many-open-files trap).
    "text_dsir" -> {
      val b = DsirBuckets
      val s = DsirScale
      s"""WITH corpus AS MATERIALIZED (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
         |  FROM documents WHERE doc_id % $DsirTargetMod != 0),
         |targ AS MATERIALIZED (
         |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
         |  FROM documents WHERE doc_id % $DsirTargetMod = 0),
         |tb AS MATERIALIZED (SELECT CAST(('0x' || substr(md5(g), 17, 16))::UBIGINT % $b AS INT) AS cell FROM (
         |  SELECT unnest(t) AS g FROM targ
         |  UNION ALL
         |  SELECT unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))])
         |  FROM targ WHERE len(t) >= 2)),
         |cb AS MATERIALIZED (SELECT doc_id, CAST(('0x' || substr(md5(g), 17, 16))::UBIGINT % $b AS INT) AS cell FROM (
         |  SELECT doc_id, unnest(t) AS g FROM corpus
         |  UNION ALL
         |  SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))])
         |  FROM corpus WHERE len(t) >= 2)),
         |model AS (
         |  SELECT cell,
         |    (coalesce(tc, 0) + 1) * ${s} // (tn + $b) AS p_fp,
         |    (coalesce(rc, 0) + 1) * ${s} // (rn + $b) AS q_fp
         |  FROM (SELECT cell, count(*) AS tc FROM tb GROUP BY cell) t
         |  FULL JOIN (SELECT cell, count(*) AS rc FROM cb GROUP BY cell) r USING (cell)
         |  CROSS JOIN (SELECT count(*) AS tn FROM tb)
         |  CROSS JOIN (SELECT count(*) AS rn FROM cb)),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_grams, CAST(sum(p_fp - q_fp) AS BIGINT) AS w
         |  FROM cb JOIN model USING (cell) GROUP BY doc_id),
         |final AS (
         |  SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams, coalesce(a.w, 0) AS dsir_weight_fp
         |  FROM (SELECT doc_id FROM corpus) d LEFT JOIN agg a USING (doc_id)),
         |rk AS (SELECT *, row_number() OVER (ORDER BY dsir_weight_fp DESC, doc_id) AS rn FROM final)
         |SELECT doc_id, n_grams, dsir_weight_fp,
         |  CAST(CASE WHEN rn <= $DsirTopK THEN 1 ELSE 0 END AS INT) AS selected
         |FROM rk""".stripMargin
    },
    "text_hash_embed" -> {
      val d = HashEmbedDim
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
         |grams AS MATERIALIZED (
         |  SELECT doc_id, unnest(t) AS g FROM toks
         |  UNION ALL
         |  SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))])
         |  FROM toks WHERE len(t) >= 2),
         |cw AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(g), 17, 16))::UBIGINT % $d AS BIGINT) AS cell,
         |    CASE WHEN ('0x' || substr(md5(g || '#s'), 17, 16))::UBIGINT % 2 = 1
         |         THEN 1 ELSE -1 END AS sgn
         |  FROM grams)
         |SELECT doc_id, cell, CAST(sum(sgn) AS BIGINT) AS w
         |FROM cw GROUP BY 1, 2 HAVING sum(sgn) != 0""".stripMargin
    },
    "samp_stratified" ->
      """WITH s AS (SELECT doc_id,
        |  CASE WHEN length(text) < 200 THEN 'short'
        |       WHEN length(text) < 400 THEN 'mid' ELSE 'long' END AS band,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 1000 AS bk
        |FROM documents)
        |SELECT band, count(*) AS n, min(doc_id) AS min_id
        |FROM s
        |WHERE bk < CASE band WHEN 'short' THEN 1000 WHEN 'mid' THEN 500 ELSE 250 END
        |GROUP BY band""".stripMargin,
    "samp_split_counts" ->
      """WITH b AS (SELECT doc_id,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 1000 AS bk FROM documents)
        |SELECT CASE WHEN bk < 980 THEN 'train' WHEN bk < 990 THEN 'valid' ELSE 'test' END AS split,
        |  count(*) AS n, min(doc_id) AS min_id
        |FROM b GROUP BY 1""".stripMargin,
    // counts → ieee isqrt (floor(sqrt) is correctly rounded IEEE in both
    // engines) → floor-div targets/rates → md5 bucket membership.
    "samp_alpha_mix" ->
      s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source),
         |w AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wgt FROM c),
         |r AS (SELECT source,
         |  least(1000, (1000 * ((wgt * $AlphaMixBudget) // (SELECT CAST(sum(wgt) AS BIGINT) FROM w))) // n) AS rate
         |  FROM w),
         |b AS (SELECT doc_id, source,
         |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 1000 AS bk
         |  FROM documents)
         |SELECT b.doc_id, b.source FROM b JOIN r USING (source) WHERE b.bk < r.rate""".stripMargin,
    "samp_token_mix" -> {
      val w = MixWeights.map { case (s, p) => s"('$s', $p)" }.mkString(", ")
      s"""WITH avail AS (SELECT source, sum(n_chars) AS a FROM documents GROUP BY source),
         |w(source, wgt) AS (VALUES $w),
         |r AS (SELECT w.source,
         |  least(1000, (1000 * ((wgt::BIGINT * $MixBudget) // 1000)) // a) AS rate
         |  FROM w JOIN avail USING (source)),
         |b AS (SELECT doc_id, source,
         |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 1000 AS bk
         |  FROM documents)
         |SELECT b.doc_id, b.source FROM b JOIN r USING (source) WHERE b.bk < r.rate""".stripMargin
    },
    "samp_epoch_shuffle" ->
      s"""SELECT doc_id, row_number() OVER (
         |    ORDER BY ('0x' || substr(md5('$ShuffleSeed:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT,
         |             doc_id) - 1 AS pos
         |FROM documents""".stripMargin,
    "text_boilerplate" ->
      s"""WITH planted AS (SELECT doc_id,
         |    (CASE WHEN doc_id % 3 = 0 THEN 'accept all cookies to continue' || chr(10) ELSE '' END)
         |    || text
         |    || (CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'copyright example site all rights reserved' ELSE '' END)
         |    || (CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'rare line ' || CAST(doc_id AS VARCHAR) ELSE '' END)
         |    AS text
         |  FROM documents),
         |bp AS (SELECT trim(line) AS k
         |  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM planted)
         |  WHERE trim(line) <> ''
         |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= $BoilerMinDocs),
         |bps AS (SELECT coalesce(list(k), CAST([] AS VARCHAR[])) AS l FROM bp),
         |f AS (SELECT doc_id,
         |    list_filter(string_split(text, chr(10)),
         |      x -> trim(x) = '' OR NOT list_contains(bps.l, trim(x))) AS keptl,
         |    len(string_split(text, chr(10))) AS total
         |  FROM planted CROSS JOIN bps)
         |SELECT doc_id, array_to_string(keptl, chr(10)) AS clean_text,
         |  CAST(total - len(keptl) AS BIGINT) AS n_dropped
         |FROM f""".stripMargin)
}
