package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/**
 * Driver-contract queries for the dedup operators. The probabilistic ones
 * (MinHash-LSH) are verified exactly: LSH only *finds candidates*; every
 * emitted pair passed an exact Jaccard check, and the banding is sized so
 * recall at the threshold is ~1 - 6e-8 — so the output equals the oracle's
 * exhaustive all-pairs scan.
 */
object DedupQueries {

  val JaccardSampleMod = 4
  val JaccardSampleThreshold = 0.5
  val MinHashThreshold = 0.8
  val SimHashMaxDist = 3
  val CosineThreshold = 0.44
  // Shared-substring parameters: interpolated into BOTH the operator call
  // and the oracle SQL so they cannot drift apart.
  val SubstringMinLen = 64
  val SubstringWindow = 8
  val SubstringModulus = 16
  // SemDeDup cell count = 2^SemPlanes; 16 cells keeps in-cell pair work
  // visible at sf0.01 while the oracle replays the same seeded planes.
  val SemPlanes = 4

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> { (s, dir) =>
      Dedup.exact(Fixtures.table(s, dir, "documents"), "doc_id", "text")
    },
    "dedup_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(
        Fixtures.table(s, dir, "documents").where(col("doc_id") % JaccardSampleMod === 0),
        "doc_id", "text", JaccardSampleThreshold)
    },
    "dedup_minhash" -> { (s, dir) =>
      // failOversized: the exhaustive-Jaccard oracle cannot replay the
      // xxhash64-band hot-bucket drop, so the contract fails loud on a
      // corpus with an oversized bucket instead of silently diverging
      Dedup.minHashPairs(Fixtures.table(s, dir, "documents"), "doc_id", "text", MinHashThreshold,
        failOversized = true)
    },
    // Cross-source duplication matrix — the provenance question behind
    // every dedup run ("did corpus B scrape corpus A?"): near-dup pairs
    // from the standard MinHash-LSH + exact-verify path, each endpoint
    // joined to its source, unordered pair normalized by least/greatest.
    // Pairs-side joins move ids only; the matrix is #sources² rows.
    "dedup_source_overlap" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      val src = docs.select(col("doc_id"), col("source"))
      // The pair set is pair-sized (≪ corpus) but its PLAN is the whole
      // MinHash pipeline: joined twice below, the planner broadcasts it
      // and each broadcast build re-runs the pipeline (stage stats r16:
      // up to 3 executions). Eagerly materialize the small result once —
      // the ngramJaccardPairs pattern.
      Dedup.minHashPairs(docs, "doc_id", "text", MinHashThreshold, failOversized = true)
        .localCheckpoint(true)
        .join(src.as("sa"), col("id_a") === col("sa.doc_id"))
        .join(src.as("sb"), col("id_b") === col("sb.doc_id"))
        .select(
          least(col("sa.source"), col("sb.source")).as("source_a"),
          greatest(col("sa.source"), col("sb.source")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
    },
    "dedup_simhash" -> { (s, dir) =>
      Dedup.simHashPairsBanded(
        Dedup.simHash(Fixtures.table(s, dir, "documents"), "doc_id", "text"),
        SimHashMaxDist)
    },
    "dedup_embedding" -> { (s, dir) =>
      Similarity.nearDupPairs(
        Fixtures.table(s, dir, "embeddings"), "vec_id", "embedding", CosineThreshold)
    },
    // The scale path for the same decision: LSH-bucketed candidates +
    // exact cosine verify. Approximate over the corpus but deterministic
    // given the seeded plane tensor, so the oracle replays the whole
    // pipeline with the planes as SQL literals (SimQueries.lshBucketsCtes).
    "dedup_embedding_lsh" -> { (s, dir) =>
      Similarity.nearDupPairsBucketed(
        Fixtures.table(s, dir, "embeddings"), "vec_id", "embedding", CosineThreshold)
    },
    // Partial overlap: docs sharing an exact >= 64-char run via
    // content-defined anchored fingerprints (winnowing). The oracle
    // replays the identical md5 arithmetic, so the check is exact.
    "dedup_shared_substring" -> { (s, dir) =>
      Dedup.sharedSubstringPairs(
        Fixtures.table(s, dir, "documents"), "doc_id", "text",
        minLen = SubstringMinLen, window = SubstringWindow, modulus = SubstringModulus)
    },
    // The CUT step over the same anchored fingerprints (Lee et al. 2022's
    // duplicate-span removal): every anchored duplicate span survives in
    // exactly one place (first (id, pos) occurrence), excised codepoint-
    // exactly everywhere else — the CLEANED corpus, hash-checked in full
    // (the oracle replays anchoring, keeper choice, and the excision with
    // substring arithmetic).
    "dedup_span_cut" -> { (s, dir) =>
      Dedup.removeSharedSpans(
        Fixtures.table(s, dir, "documents"), "doc_id", "text",
        minLen = SubstringMinLen, window = SubstringWindow, modulus = SubstringModulus)
    },
    // The FIXPOINT variant (Lee et al.'s iterate-to-convergence note):
    // re-detect + re-cut until a round finds nothing, loud past the
    // round bound. The oracle replays the round chain twice (round 2 is
    // the operator's convergence-proof round — identity on a one-pass
    // corpus, the genuine second cut otherwise).
    "dedup_span_cut_iterated" -> { (s, dir) =>
      Dedup.removeSharedSpansIterated(
        Fixtures.table(s, dir, "documents"), "doc_id", "text",
        minLen = SubstringMinLen, window = SubstringWindow, modulus = SubstringModulus)
    },
    // SemDeDup (Abbas et al. 2023): the semantic KEEP decision — cells
    // from one seeded hyperplane table, and any row >= t-similar to a
    // smaller id in its cell is dropped. Deterministic planes make even
    // this clustered decision fully oracled.
    "dedup_semantic" -> { (s, dir) =>
      Similarity.semanticDedup(
        Fixtures.table(s, dir, "embeddings"), "vec_id", "embedding",
        CosineThreshold, SemPlanes)
    },
    // The dedup decision: one representative per near-dup cluster
    // (components over the MinHash-LSH pair set, which equals the exact
    // pair set — verified above).
    "dedup_clusters" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      Dedup.components(
        docs.select(col("doc_id").as("id")),
        Dedup.minHashPairs(docs, "doc_id", "text", MinHashThreshold, failOversized = true))
        .select(col("id").as("doc_id"), col("rep_id"))
    })

  /** Exact-Jaccard oracle tail shared by both shingle units. */
  /** ONE span-cut round as a CTE chain reading (doc_id, text) from
    * `src`, every CTE name prefixed with `p`, ending in `${p}out`
    * (doc_id, n_cuts, text) — anchored fingerprints (the detector's
    * rolling window hash folded over per-character unicode()), keeper =
    * first (doc_id, pos) per fingerprint, excision as pure substring
    * arithmetic (a character survives iff no cut interval [p, p+minLen)
    * covers it). `cuts` is MATERIALIZED (referenced by the anti-join AND
    * the count) and `out` is MATERIALIZED (the iterated oracle reads it
    * three times — default inlining would re-run the char-level chain
    * per reference). Shared by dedup_span_cut and its iterated twin so
    * the two replays can never drift. */
  private def spanCutRound(src: String, p: String): String =
    s"""${p}pos AS (
       |  SELECT doc_id, text,
       |    unnest(range(1, greatest(length(text) - ${SubstringMinLen - 1}, 0) + 1)) AS i
       |  FROM $src WHERE length(text) >= $SubstringMinLen),
       |${p}anch AS (
       |  SELECT doc_id, CAST(i AS INT) AS p,
       |    md5(substr(text, CAST(i AS INT), $SubstringMinLen)) AS fp
       |  FROM ${p}pos
       |  WHERE list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      [CAST(unicode(c) AS BIGINT) FOR c IN
       |        list_filter(string_split(substr(text, CAST(i AS INT), $SubstringWindow), ''), x -> x != '')]),
       |      (a, b) -> (a * 31 + b) % 1000000007) % $SubstringModulus = 0),
       |${p}ranked AS (
       |  SELECT doc_id, p,
       |    row_number() OVER (PARTITION BY fp ORDER BY doc_id, p) AS rn
       |  FROM ${p}anch),
       |${p}cuts AS MATERIALIZED (SELECT DISTINCT doc_id, p FROM ${p}ranked WHERE rn > 1),
       |${p}chars AS (
       |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS j
       |  FROM $src WHERE length(text) > 0),
       |${p}kept AS (
       |  SELECT c.doc_id, c.j, substr(c.text, CAST(c.j AS INT), 1) AS ch
       |  FROM ${p}chars c
       |  WHERE NOT EXISTS (SELECT 1 FROM ${p}cuts u
       |    WHERE u.doc_id = c.doc_id
       |      AND c.j >= u.p AND c.j < u.p + $SubstringMinLen)),
       |${p}clean AS (
       |  SELECT doc_id, string_agg(ch, '' ORDER BY j) AS t
       |  FROM ${p}kept GROUP BY doc_id),
       |${p}nc AS (SELECT doc_id, count(*) AS n FROM ${p}cuts GROUP BY doc_id),
       |${p}out AS MATERIALIZED (
       |  SELECT d.doc_id,
       |    CAST(coalesce(${p}nc.n, 0) AS BIGINT) AS n_cuts,
       |    coalesce(cl.t, '') AS text
       |  FROM $src d
       |  LEFT JOIN ${p}clean cl USING (doc_id)
       |  LEFT JOIN ${p}nc USING (doc_id))""".stripMargin

  private def jaccardTail(threshold: Double): String =
    s"""c AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
       |          FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT ia AS id_a, ib AS id_b,
       |  CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
       |FROM inter JOIN c ca ON ca.doc_id = ia JOIN c cb ON cb.doc_id = ib
       |WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= $threshold""".stripMargin

  /** Character 5-gram shingles + exact Jaccard pairs. */
  private def jaccardOracle(filt: String, threshold: Double): String =
    s"""WITH d AS (SELECT doc_id, text FROM documents $filt),
       |pos AS (SELECT doc_id, text, unnest(range(1, greatest(length(text)-4, 0)+1)) AS i FROM d),
       |s AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS sh FROM pos),
       |${jaccardTail(threshold)}""".stripMargin

  /** `tok`/`pos`/`s` CTE chain: each doc's DISTINCT word 3-gram shingles
    * (the MinHash unit) — ONE definition shared by every oracle that
    * replays shingling (here and PipelineQueries' dedup-index oracle); a
    * drifted copy would only fail when the fixture exercises it. */
  private[queries] def wordShingleCtes: String =
    s"""tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
       |pos AS (SELECT doc_id, ts, unnest(range(1, greatest(len(ts)-2, 0)+1)) AS i FROM tok),
       |s AS (SELECT DISTINCT doc_id,
       |  ts[CAST(i AS INT)] || ' ' || ts[CAST(i+1 AS INT)] || ' ' || ts[CAST(i+2 AS INT)] AS sh FROM pos)""".stripMargin

  /** Word 3-gram shingles + exact Jaccard pairs. */
  private def wordJaccardOracle(threshold: Double): String =
    s"""WITH $wordShingleCtes,
       |${jaccardTail(threshold)}""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |FROM documents)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM n GROUP BY norm""".stripMargin,
    "dedup_ngram_jaccard" ->
      jaccardOracle(s"WHERE doc_id % $JaccardSampleMod = 0", JaccardSampleThreshold),
    "dedup_minhash" ->
      wordJaccardOracle(MinHashThreshold),
    "dedup_source_overlap" ->
      s"""WITH pairs AS (SELECT id_a, id_b FROM (${wordJaccardOracle(MinHashThreshold)})),
         |ds AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_a,
         |  greatest(a.source, b.source) AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs JOIN ds a ON a.doc_id = pairs.id_a JOIN ds b ON b.doc_id = pairs.id_b
         |GROUP BY 1, 2""".stripMargin,
    // Banded replay (not the exhaustive cross join): pigeonhole chunks +
    // the hot-bucket cap (HAVING count <= cap) + exact Hamming verify —
    // simHashPairsBanded step for step, hash-checkable at any corpus
    // size. For sub-cap corpora this equals the exhaustive all-pairs
    // result (pigeonhole exactness, pinned in OperatorsSpec).
    "dedup_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents),
         |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::UBIGINT::BIGINT AS h32 FROM tok),
         |bits AS (SELECT doc_id, unnest(range(0, 32)) AS b, h32 FROM h),
         |v AS (SELECT doc_id, b, sum(CASE WHEN (h32 >> b) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
         |      FROM bits GROUP BY 1, 2),
         |sh AS (SELECT doc_id, sum(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS v
         |       FROM v GROUP BY 1),
         |bands AS (SELECT doc_id, v, c.chunk, (v >> CAST(c.chunk * 8 AS INT)) & 255 AS cv
         |          FROM sh, range(0, 4) c(chunk)),
         |bok AS (SELECT chunk, cv FROM bands GROUP BY chunk, cv
         |        HAVING count(*) <= ${graft.operators.LshBuckets.MaxBucket}),
         |bb AS (SELECT bands.* FROM bands JOIN bok USING (chunk, cv))
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.v, b.v)) AS BIGINT) AS dist
         |FROM bb a JOIN bb b ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.v, b.v)) <= $SimHashMaxDist""".stripMargin,
    "dedup_embedding" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= $CosineThreshold""".stripMargin,
    // Full LSH replay (planes interpolated as literals): candidates =
    // pairs sharing any sub-cap (table, bucket) — the hot-bucket cap is
    // replayed too (HAVING count <= cap), so the query stays
    // hash-checkable at ANY corpus size — then the exact cosine verify:
    // nearDupPairsBucketed step for step.
    "dedup_embedding_lsh" ->
      s"""WITH ${SimQueries.lshBucketsCtes},
         |bok AS (SELECT tbl, bucket FROM b GROUP BY tbl, bucket
         |        HAVING count(*) <= ${graft.operators.LshBuckets.MaxBucket}),
         |bb AS (SELECT b.* FROM b JOIN bok USING (tbl, bucket)),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
         |  FROM bb a JOIN bb c ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.vec_id < c.vec_id)
         |SELECT cand.id_a, cand.id_b
         |FROM cand JOIN ef ea ON ea.vec_id = cand.id_a
         |          JOIN ef eb ON eb.vec_id = cand.id_b
         |WHERE list_cosine_similarity(ea.v, eb.v) >= $CosineThreshold""".stripMargin,
    // anchor rule = Rabin-Karp window hash ≡ 0 mod modulus; the oracle
    // replays the same mod-p polynomial as a per-window fold over unicode
    // codepoints (== UTF-16 code units on this all-BMP fixture, matching
    // the Spark kernel's charAt)
    "dedup_shared_substring" ->
      s"""WITH pos AS (
        |  SELECT doc_id, text,
        |    unnest(range(1, greatest(length(text) - ${SubstringMinLen - 1}, 0) + 1)) AS i
        |  FROM documents WHERE length(text) >= $SubstringMinLen),
        |anch AS (
        |  SELECT doc_id, md5(substr(text, CAST(i AS INT), $SubstringMinLen)) AS fp
        |  FROM pos
        |  WHERE list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT) FOR c IN
        |        list_filter(string_split(substr(text, CAST(i AS INT), $SubstringWindow), ''), x -> x != '')]),
        |      (a, b) -> (a * 31 + b) % 1000000007) % $SubstringModulus = 0),
        |f AS (SELECT DISTINCT doc_id, fp FROM anch),
        |fok AS (SELECT fp FROM f GROUP BY fp
        |        HAVING count(*) <= ${graft.operators.LshBuckets.MaxBucket}),
        |ff AS (SELECT f.* FROM f JOIN fok USING (fp))
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id""".stripMargin,
    // Replays the full cut: the detector's anchor rule with positions
    // kept, keeper = first (doc_id, pos) per fingerprint (row_number),
    // then the excision as pure substring arithmetic — a character
    // survives iff no cut interval [p, p+minLen) covers it. `cuts` is
    // MATERIALIZED (referenced by the anti-join AND the per-doc count —
    // default inlining would run the window function twice).
    "dedup_span_cut" ->
      s"""WITH ${spanCutRound("documents", "")}
        |SELECT doc_id, n_cuts, text FROM out""".stripMargin,
    // The fixpoint variant: the SAME round chain applied TWICE, round 2
    // reading round 1's cleaned output. Round 2 replays the operator's
    // convergence-proof round — on a corpus converging in one pass
    // (every round so far) it is the identity and the two queries hash
    // identically; on a corpus where an excision joins text into a NEW
    // shared run, round 2 cuts it exactly as the operator's re-detection
    // does. (A corpus demanding a THIRD round would hash-mismatch here
    // and widen the operator's rounds — loud on both sides, never a
    // silent divergence; OperatorsSpec pins the multi-round semantics on
    // a constructed fixture.)
    "dedup_span_cut_iterated" ->
      s"""WITH ${spanCutRound("documents", "")},
        |${spanCutRound("out", "r2")}
        |SELECT a.doc_id, a.n_cuts + b.n_cuts AS n_cuts, b.text
        |FROM out a JOIN r2out b USING (doc_id)""".stripMargin,
    // SemDeDup replay: the single-table cell assignment from the same
    // interpolated planes, in-cell dominated-by-smaller-id drops, then
    // the anti-join — semanticDedup step for step. The CTE chain is
    // SHARED verbatim with pipeline_data_prune's oracle (semDedupChain)
    // so the standalone query and the D4 composition can never drift.
    "dedup_semantic" ->
      s"""WITH ${semDedupChain("")}
         |SELECT c.vec_id AS id, c.cell FROM cells c
         |LEFT JOIN dropped d ON c.vec_id = d.id WHERE d.id IS NULL
         |UNION ALL
         |SELECT vec_id AS id, CAST(-1 AS BIGINT) AS cell FROM embeddings
         |WHERE vec_id NOT IN (SELECT vec_id FROM ef)""".stripMargin,
    "dedup_clusters" ->
      s"""WITH $wordShingleCtes,
         |c AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
         |          FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS (SELECT ia, ib FROM inter JOIN c ca ON ca.doc_id = ia JOIN c cb ON cb.doc_id = ib
         |  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= $MinHashThreshold),
         |edges AS (SELECT ia AS src, ib AS dst FROM pairs UNION SELECT ib, ia FROM pairs),
         |reach AS (
         |  WITH RECURSIVE r(id, lbl) AS (
         |    SELECT doc_id, doc_id FROM documents
         |    UNION
         |    SELECT e.src, r.lbl FROM edges e JOIN r ON e.dst = r.id)
         |  SELECT id, min(lbl) AS rep_id FROM r GROUP BY id)
         |SELECT id AS doc_id, rep_id FROM reach""".stripMargin)

  /** The [[graft.operators.Similarity.semanticDedup]] replay chain over
    * the embeddings table — planes (SemPlanes, table 1), norm-filtered
    * vectors, sign cells, and the in-cell dominated-by-smaller-id drop
    * set at [[CosineThreshold]]. Shared verbatim by the standalone
    * `dedup_semantic` oracle (prefix = "") and the D4 composition
    * `pipeline_data_prune` (prefix = "s"), so the two can never drift —
    * the protoPruneChain convention. Defines CTEs `<p>pl` / `<p>ef` /
    * `<p>cells` / `<p>dropped`; multi-referenced stages MATERIALIZED
    * (the CTE-chain rule). */
  private[queries] def semDedupChain(p: String): String =
    s"""${p}pl(tbl, bit, pv) AS (VALUES
       |${SimQueries.planesValues(1, SemPlanes)}),
       |${p}ef AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |  WHERE sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) > 0),
       |${p}cells AS MATERIALIZED (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN list_inner_product(${p}ef.v, ${p}pl.pv) > 0
       |        THEN (CAST(1 AS BIGINT) << bit) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS cell
       |  FROM ${p}ef, ${p}pl GROUP BY 1),
       |${p}cok AS (SELECT cell FROM ${p}cells GROUP BY 1
       |  HAVING count(*) <= ${graft.operators.LshBuckets.MaxBucket}),
       |${p}dropped AS MATERIALIZED (
       |  SELECT DISTINCT y.vec_id AS id
       |  FROM ${p}cells x JOIN ${p}cells y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  JOIN ${p}cok ck ON ck.cell = x.cell
       |  JOIN ${p}ef ex ON ex.vec_id = x.vec_id
       |  JOIN ${p}ef ey ON ey.vec_id = y.vec_id
       |  WHERE list_cosine_similarity(ex.v, ey.v) >= $CosineThreshold)""".stripMargin
}
