package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, quality scoring, language identification, and document
 * fingerprinting. Everything is per-row with no shuffle (embarrassingly
 * parallel), built from Spark SQL functions — no Scala/Python UDFs.
 * All functions stay inside whole-stage codegen except
 * [[stopwordCount]]'s higher-order `filter`, whose lambda evaluates
 * interpreted per token — acceptable at per-token cost, and kept because
 * it's exactly reproducible in the oracle SQL.
 *
 * The heuristics are deliberately simple *and exactly reproducible in
 * ANSI SQL*, so every operator has a DuckDB oracle.
 */
object TextAnalysis {

  /** Whitespace-delimited token count. */
  def wsTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword count: letter runs, single digits, single symbols. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Lowercased alphanumeric word tokens (the unit for simhash / stopwords). */
  /** Lower-cased [a-z0-9]+ runs. NULL-SAFE: null text tokenizes as the
    * EMPTY array, never null — a null array nulls any concat it enters
    * and explode(NULL) silently drops the document's row (the dsirScore
    * row-loss class; index builders would publish null/garbage `d:`
    * records). Every consumer treats "no text" as "zero tokens". */
  def wordTokens(text: Column): Column =
    coalesce(
      regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)),
      array().cast("array<string>"))

  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")

  /**
   * Sliding-window document chunking — the retrieval/embedding unit cut
   * (RAG corpora, context-bounded embedding models): each document's
   * token stream splits into windows of `chunkTokens` advancing by
   * `chunkTokens - overlapTokens`, so consecutive chunks share
   * `overlapTokens` tokens of context (the complement of
   * [[graft.operators.Packing]]'s concat-and-chunk, which packs MANY
   * docs into training sequences; this cuts ONE doc into query-sized
   * pieces that each stand alone).
   *
   * Emits (doc_id, chunk_no, start_tok, n_tok, chunk_text): chunk k
   * starts at token `k*stride`; a start past `n - overlapTokens` would
   * add only tokens the previous chunk already covers, so it is not
   * emitted (`chunks = max(1, ceil((n - overlap) / stride))` — every
   * token is covered, no fully-redundant tail). `chunk_text` is the
   * tokens rejoined with single spaces (the tokenized reconstruction —
   * chunk-level ops downstream all work on [[wordTokens]] anyway).
   * Zero-token documents yield no chunks (nothing to retrieve). Pure
   * per-row array math: one codegen'd projection + explode, no shuffle,
   * no UDF — at 100 TB chunking is a map, not a job.
   */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlapTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .where(col("n") > 0)
      // integer ceil — exact long math, replayed verbatim by the oracle
      .withColumn("n_chunks",
        greatest(lit(1L), expr(s"(n - $overlapTokens + ${stride - 1}) div $stride")))
      .select(
        col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_no"))
      .select(
        col("doc_id"),
        col("chunk_no"),
        (col("chunk_no") * stride).as("start_tok"),
        slice(col("toks"), (col("chunk_no") * stride + 1).cast("int"),
          lit(chunkTokens)).as("ctoks"))
      .select(
        col("doc_id"), col("chunk_no"), col("start_tok"),
        size(col("ctoks")).cast("long").as("n_tok"),
        array_join(col("ctoks"), " ").as("chunk_text"))
  }

  /** How many tokens are stopwords (quality signal: prose vs noise). */
  def stopwordCount(text: Column): Column =
    size(filter(wordTokens(text), t => t.isin(Stopwords: _*)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))

  /** Marker stopwords per language for the language-ID heuristic:
    * count marker-word hits, argmax with a fixed tie order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "es" -> Seq("el", "los", "y", "que", "una"))

  /** Non-overlapping occurrence count of ` marker ` in the padded text —
    * pure integer string math so any SQL engine agrees exactly. */
  def markerOccurrences(text: Column, marker: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val needle = s" $marker "
    ((length(padded) - length(regexp_replace(padded, needle, ""))) / needle.length).cast("int")
  }

  def langScore(text: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang).map(m => markerOccurrences(text, m)).reduce(_ + _)

  /** argmax of the language scores with fixed priority order; 'und' when
    * no marker hits at all. */
  def langId(scores: Map[String, Column]): Column = {
    val ordered = LangMarkers.map(_._1)
    ordered.zipWithIndex.foldRight(lit("und")) { case ((lang, i), elseCol) =>
      val beats = ordered.drop(i + 1).map(o => scores(lang) >= scores(o)) :+ (scores(lang) > 0)
      when(beats.reduce(_ && _), lit(lang)).otherwise(elseCol)
    }
  }

  /** Rolling polynomial hash of the full character stream
    * (acc*31 + code unit, mod 1e9+7) — the document fingerprint, as a
    * codegen'd [[graft.core.RollingHashExpr]] (one tight loop per doc;
    * equals folding `ascii` over `split(s, "")` for BMP text, which is
    * what the SQL oracle reproduces). */
  def fingerprint(text: Column): Column = graft.functions.rolling_hash(text)

  /** Canonical normalized form for exact near-dup matching: lowercase,
    * strip non-alphanumerics, collapse whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Full quality report: one row per document, all signals. */
  def qualityReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      wsTokenCount(t).cast("long").as("ws_tokens"),
      bpeTokenCount(t).cast("long").as("bpe_tokens"),
      stopwordCount(t).cast("long").as("stopword_cnt"),
      punctCount(t).cast("long").as("punct_cnt"))
      .withColumn(
        "stopword_ratio",
        col("stopword_cnt").cast("double") / greatest(col("ws_tokens"), lit(1)))
      .withColumn(
        "avg_token_len",
        col("n_chars").cast("double") / greatest(col("ws_tokens"), lit(1)))
  }

  /** Corpus-level statistics in two aggregates (doc-grain + token-grain),
    * joined as single-row frames: document count, token and char totals,
    * vocabulary size, and length-band counts. All integer math.
    *
    * `exactVocab = false` is the 100 TB path: exact `count_distinct` over
    * an exploded token stream shuffles every distinct token (a billions-
    * row exchange on a web corpus); the HyperLogLog++ sketch
    * (`approx_count_distinct`, here at 1% relative SD) aggregates
    * map-side into a fixed-size buffer and shuffles only sketch bytes.
    * The exact form stays the contract/oracle default; the two are
    * pinned within tolerance in OperatorsSpec. */
  def corpusStats(
      df: DataFrame,
      textCol: String,
      exactVocab: Boolean = true): DataFrame = {
    val t = col(textCol)
    val docStats = df.select(
      length(t).cast("long").as("n_chars"),
      wsTokenCount(t).cast("long").as("ws_tokens"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("short_docs"),
        sum(when(col("n_chars") >= 200 && col("n_chars") < 400, 1L).otherwise(0L)).as("mid_docs"),
        sum(when(col("n_chars") >= 400, 1L).otherwise(0L)).as("long_docs"))
    val tokens = df.select(explode(wordTokens(t)).as("tok"))
    val vocab =
      if (exactVocab) tokens.agg(count_distinct(col("tok")).as("vocab_size"))
      else tokens.agg(approx_count_distinct(col("tok"), rsd = 0.01).as("vocab_size"))
    docStats.crossJoin(vocab)
  }

  /** Space-joined word n-grams of the text (empty array when the doc has
    * fewer than n tokens — NOT a descending `sequence`, which is what the
    * unguarded `sequence(0, size-n)` degenerates to on short docs). */
  def wordNGrams(text: Column, n: Int): Column =
    tokenNGrams(wordTokens(text), n)

  /** N-grams over an already-tokenized array — callers that need both
    * tokens and n-grams of one text compute the token array once. */
  def tokenNGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /**
   * Test-set decontamination (the GPT-3/PaLM pipeline step): flag corpus
   * documents that contain any word n-gram occurring in the benchmark
   * set. Returns one row per corpus document — `n_hits` distinct
   * contaminated n-grams and a 0/1 `contaminated` flag — so the caller
   * can either drop flagged docs or audit the hit counts.
   *
   * Scale shape: the benchmark gram set is small by definition (eval sets
   * are millions of n-grams at most), so it is `broadcast` and the corpus
   * side never shuffles its exploded grams — the only shuffles are the
   * per-doc hit count (map-side partial agg on doc id) and the left join
   * back to the corpus id list. Corpus text is touched exactly once.
   * `hashGrams = true` joins on xxhash64 of the gram instead of the
   * string — ~10x smaller broadcast and cheaper probes at corpus scale,
   * at a ~|corpus grams| x |bench grams| / 2^64 false-positive-flag risk
   * (standard practice; the exact variant stays the contract/oracle
   * path, and the two are pinned equal on real data in OperatorsSpec).
   */
  def decontaminate(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      hashGrams: Boolean = false): DataFrame = {
    require(n >= 1, s"decontaminate: n must be >= 1, got $n")
    def gramKey(g: Column): Column = if (hashGrams) xxhash64(g) else g
    val benchGrams = bench
      .select(explode(wordNGrams(col(textCol), n)).as("g"))
      .select(gramKey(col("g")).as("gram"))
      .distinct()
    val corpusGrams = corpus
      .select(col(idCol), explode(array_distinct(wordNGrams(col(textCol), n))).as("g"))
      .select(col(idCol), gramKey(col("g")).as("gram"))
    val hits = corpusGrams
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_hits"), lit(0L)) > 0, 1L).otherwise(0L).as("contaminated"))
  }

  /**
   * Intra-document repetition signals (Gopher-style quality filters):
   * duplicate-token and duplicate-trigram instance counts, and the
   * instance count of the most frequent word bigram. All per-row array
   * math — no shuffle, cost linear in corpus size and document length
   * (the most-frequent count is a codegen'd single hash-map pass,
   * [[graft.core.TopFreqExpr]] — the equivalent
   * `array_max(transform(array_distinct, …filter…))` formulation
   * evaluates its lambdas interpreted at O(len x distinct) per doc and
   * was a 14 s bench outlier). Ratios divide the same integers in both
   * engines, so they compare bit-for-bit.
   */
  def repetitionReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // staged-projection aliases — loud on collision, the _bsz precedent
    // (the pre-r11 flat form had no internal aliases, so these names
    // regressing silently into AMBIGUOUS_REFERENCE would be new)
    require(!Set("toks", "bi", "tri").contains(idCol),
      s"repetitionReport: id column '$idCol' collides with an internal " +
        "staging alias (toks/bi/tri) — rename the id column")
    // Tokenize ONCE in its own projection, then derive the n-gram arrays
    // from the materialized token array in a second projection. The flat
    // formulation (wordNGrams(text, n) per output column) evaluated the
    // tokenizing regexp_extract_all up to 6x per row UNLESS codegen
    // subexpression elimination hoisted it — and the r10 null-safety
    // `coalesce` in [[wordTokens]] made the shared subtree a conditional
    // expression, exactly the class Spark's subexpression extraction
    // declines to hoist (the r10 bench-of-record 17.9 s outlier). The
    // staged form doesn't depend on CSE at all: CollapseProject keeps a
    // projection boundary whenever a non-cheap alias is referenced more
    // than once downstream, which `toks` (4 uses) / `bi` (2) / `tri` (2)
    // all are. Pinned by PlanShapeSpec ("repetitionReport tokenizes
    // once"): exactly ONE regexp_extract_all in the optimized plan.
    df.select(col(idCol), wordTokens(col(textCol)).as("toks"))
      .select(
        col(idCol), col("toks"),
        tokenNGrams(col("toks"), 2).as("bi"),
        tokenNGrams(col("toks"), 3).as("tri"))
      .select(
        col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(array_distinct(col("toks")))).cast("long").as("dup_token_cnt"),
        (size(col("tri")) - size(array_distinct(col("tri")))).cast("long").as("dup_trigram_cnt"),
        graft.functions.top_freq(col("bi")).cast("long").as("top_bigram_cnt"),
        size(col("bi")).cast("long").as("n_bigrams"))
      .withColumn(
        "dup_token_frac",
        col("dup_token_cnt").cast("double") / greatest(col("n_tokens"), lit(1)))
      .withColumn(
        "top_bigram_frac",
        col("top_bigram_cnt").cast("double") / greatest(col("n_bigrams"), lit(1)))
  }

  /** Conservative PII-ish patterns shared by Java regex and RE2 (DuckDB):
    * the character classes avoid dialect-divergent constructs (explicit
    * ` \t\n\r`, not `\S`, since the two engines' whitespace classes
    * differ on unicode — and a space-only negation would let a URL match
    * run through a newline and eat the next line's text). Scrubbing is a
    * per-row regexp_replace — shuffle-free. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ \\t\\n\\r]+"

  /** Text with emails/URLs replaced by placeholder tokens. */
  def scrubbed(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), UrlRe, "<URL>")

  /** Phone numbers: international `+CC` prefix optional, then either a
    * parenthesized area code or 3 digits, with `-`/`.`/space separators
    * REQUIRED between the trailing 3+4 groups — the separators are what
    * keep dates (2024-01-02: 4-2-2 digit shape) and bare integers out.
    * No `\b` anchors here: the leading paren alternative would sit at a
    * non-word boundary, and RE2 (the DuckDB oracle engine) has no
    * lookaround to express "not preceded by a digit" — both engines see
    * the identical pattern, which is the contract. */
  val PhoneRe =
    "(\\+[0-9]{1,3}[-. ])?(\\([0-9]{3}\\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}"

  /** Dotted-quad IPv4. `\b` is safe here (digit/non-word edges only) and
    * keeps the match out of longer digit runs; octets are not
    * range-checked (RE2-safe simplicity — 999.0.0.1 redacts too, which
    * errs toward privacy). */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Full PII pass: email, URL, phone, IPv4 → placeholder tokens.
    * Replacement ORDER is part of the contract: URLs go before phone/IP
    * so a dotted host or numeric path is redacted as the URL it is, not
    * re-matched piecemeal by the narrower patterns. */
  def scrubbedPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Redaction report: per-doc match counts plus the rolling-hash
    * fingerprint of the scrubbed text — the fingerprint proves the
    * replacement itself (not just the counts) is identical across
    * engines. The training-pipeline contact-info scrub step. */
  def scrubReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(UrlRe), lit(0))).cast("long").as("n_urls"),
      fingerprint(scrubbed(t)).as("scrub_fp"))
  }

  /** [[scrubReport]] widened to the full PII class set (email, URL,
    * phone, IPv4). Counts are per-pattern over the RAW text (a dotted
    * host inside a URL counts as both — occurrence reporting); the
    * fingerprint pins the ORDERED redaction of [[scrubbedPii]], so the
    * replacement text itself (not just the counts) is checked across
    * engines. Per-row regexp work only — shuffle-free. */
  def scrubPiiReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(UrlRe), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      fingerprint(scrubbedPii(t)).as("scrub_fp"))
  }

  /**
   * C4-style boilerplate line removal: drop every line whose trimmed text
   * repeats across `minDocs` distinct documents (cookie banners, nav
   * menus, legal footers — the line-level dedup step of the C4/CCNet
   * pipelines; reference capability class: corpus-wide cleanup before
   * training). Blank lines are never boilerplate — they would "repeat"
   * in every document and vanish, destroying paragraph structure.
   *
   * Scale shape: posexplode lines (linear in corpus size), one
   * hash-shuffle distinct-doc count per line key, and the boilerplate set
   * — tiny after the HAVING, only keys crossing the threshold survive —
   * anti-joined back (AQE broadcasts it when small, which at corpus scale
   * it is). Per-doc reassembly restores the original line order with
   * `array_sort(struct(pos, line))`, one groupBy shuffle; the transform
   * lambda is interpreted but O(lines) per doc — a single pass, not the
   * O(len × distinct) shape that made top-bigram a bench outlier.
   * Nothing data-sized ever reaches the driver.
   *
   * Output: idCol, clean_text (original line order, boilerplate removed;
   * "" when every line was boilerplate), n_dropped (long).
   */
  def boilerplateRemoval(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"boilerplateRemoval: minDocs must be >= 2, got $minDocs")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .withColumnRenamed("col", "line")
      .withColumn("k", trim(col("line")))
    val bp = lines
      .where(col("k") =!= "")
      .groupBy(col("k"))
      .agg(count_distinct(col(idCol)).as("d"))
      .where(col("d") >= minDocs)
      .select("k")
    val kept = lines.join(bp, Seq("k"), "left_anti")
    val assembled = kept
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")),
          "\n").as("clean_text"),
        count(lit(1)).as("_kept"))
    // Left join from the original ids: a document whose every line was
    // boilerplate has no kept rows but must still appear (empty, dropped
    // count = its line count) — silently vanishing docs would corrupt any
    // downstream join on the corpus.
    // size(split(null)) is -1 under Spark's legacy sizeOfNull: a null
    // text has zero lines, not minus one dropped.
    df.select(col(idCol),
        when(col(textCol).isNull, lit(0L))
          .otherwise(size(split(col(textCol), "\n")).cast("long")).as("_total"))
      .join(assembled, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("_total") - coalesce(col("_kept"), lit(0L))).as("n_dropped"))
  }

  /**
   * Paragraph-level exact dedup, keep-FIRST-occurrence — the
   * RefinedWeb/CCNet paragraph dedup step, and the complement of
   * [[boilerplateRemoval]]: boilerplate drops a line EVERYWHERE once it
   * repeats across `minDocs` documents; this keeps each distinct
   * paragraph's globally first occurrence (lowest `(doc, position)`) and
   * drops every later repeat, including repeats inside one document.
   *
   * Paragraphs are `\n{2,}`-separated segments, space-trimmed, empties
   * ignored; output text re-joins the kept paragraphs with a normalized
   * `"\n\n"` in original order.
   *
   * Scale shape: first-occurrence resolution is a `groupBy(paragraph)`
   * `min(struct(doc, pos))` — partial-aggregated map-side, so a
   * paragraph duplicated across 100M documents combines per partition
   * and never funnels one task (the window formulation would); one
   * equi-join back on the paragraph and one per-doc reassembly groupBy.
   * Nothing data-sized reaches the driver.
   *
   * Output: idCol, clean_text, n_dropped (long).
   */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val paras = df
      .select(col(idCol), posexplode(split(col(textCol), "\\n{2,}")))
      .withColumn("para", trim(col("col")))
      .where(col("para") =!= "")
      .select(col(idCol), col("pos"), col("para"))
    val firsts = paras
      .groupBy(col("para"))
      .agg(min(struct(col(idCol), col("pos"))).as("_first"))
    val kept = paras.join(firsts, Seq("para"))
      .where(col("_first")(idCol) === col(idCol) && col("_first")("pos") === col("pos"))
    val assembled = kept
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("para")))),
            s => s.getField("para")),
          "\n\n").as("clean_text"),
        count(lit(1)).as("_kept"))
    val totals = paras.groupBy(col(idCol)).agg(count(lit(1)).as("_total"))
    // Left join from the original ids: a doc whose every paragraph lost
    // its first-occurrence race still appears (empty text, full drop
    // count), and a doc with no paragraphs at all appears untouched.
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(assembled, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (coalesce(col("_total"), lit(0L)) - coalesce(col("_kept"), lit(0L)))
          .as("n_dropped"))
  }

  /**
   * URL/domain blocklist filtering — the UT1-blocklist / C4 provenance
   * gate of a web corpus: drop documents whose source URL's host falls
   * under a blocked domain (exact host or any parent-domain suffix, the
   * way blocklists are written: blocking `tracker-example.com` must
   * catch `ads.www.tracker-example.com`).
   *
   * Mechanics: lower-cased host extracted from the URL (scheme, userinfo,
   * port, path stripped by one anchored regex), then the host's parent
   * suffix chain (`a.b.c` -> `a.b.c`, `b.c`, `c`) joined against the
   * blocklist. The blocklist rides a BROADCAST (real blocklists are
   * ~MBs for millions of entries) and the corpus explodes to at most
   * label-count rows per doc — never a regex per blocklist entry, which
   * is the naive formulation that dies at a few thousand rules.
   * `matched_rule` is the lexicographically-smallest matched entry
   * (deterministic under multiple hits; both engines replay the min).
   *
   * Output: (idCol, host, blocked int, matched_rule string-or-null).
   */
  def urlBlocklistFilter(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hostRe = "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+).*$"
    val hosts = df.select(
      col(idCol),
      lower(regexp_extract(col(urlCol), hostRe, 1)).as("host"))
    val rules = blockedDomains.toDF("rule").select(lower(col("rule")).as("rule"))
    // split once per row into a column: HOF lambdas evaluate interpreted
    // per element (CLAUDE.md), so re-splitting inside the lambda would
    // cost O(labels) splits per suffix
    val suffixes = hosts
      .select(col(idCol), col("host"), split(col("host"), "\\.").as("_parts"))
      .select(
        col(idCol), col("host"),
        explode(expr(
          "transform(sequence(1, size(_parts)), i -> array_join(slice(_parts, i, size(_parts)), '.'))"))
          .as("rule"))
    val matched = suffixes.join(broadcast(rules), Seq("rule"))
      .groupBy(col(idCol))
      .agg(min(col("rule")).as("matched_rule"))
    hosts.join(matched, Seq(idCol), "left")
      .select(
        col(idCol), col("host"),
        when(col("matched_rule").isNotNull, lit(1)).otherwise(lit(0)).as("blocked"),
        col("matched_rule"))
  }

  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score each document of
   * a raw corpus by how much more likely its hashed n-gram features are
   * under a TARGET distribution (the data you want more of — a trusted
   * reference split) than under the RAW distribution (the corpus
   * itself); select the top-weighted slice as training data. This is the
   * data-recipe step BETWEEN quality filtering (absolute signals) and
   * token-budget mixing (source shares): distribution matching.
   *
   * Features are the paper's: word unigrams + bigrams hashed into
   * `buckets` cells — here by the engine's md5-mod routing
   * ([[graft.core.ShardIndex]]), which is already byte-replayable in SQL,
   * so the WHOLE pipeline oracles. Both cell models are
   * Laplace-smoothed: `p_fp(b) = (t(b)+1)*scale div (tN+buckets)` over
   * target grams, `q_fp(b)` likewise over the corpus's own grams.
   *
   * Engine-replayability deviation (the [[lmScore]] precedent): the
   * paper accumulates `log(p/q)`; logs are transcendental and differ in
   * the last ULP across engines, so the weight here is the fixed-point
   * probability difference `sum_g (p_fp(b_g) - q_fp(b_g))` — same sign
   * structure (grams over-represented in the target push a document up,
   * corpus-generic grams push it down), all integer, addition-order-free,
   * bit-identical anywhere. Resampling follows as a deterministic top-k
   * by (weight, id) instead of the paper's Gumbel draw — the smoothed
   * sampling is one seeded md5 column away if ever needed.
   *
   * Scale shape: each model is at most `buckets` rows (broadcast); gram
   * totals ride 1-row crossJoins (never a driver collect); corpus text
   * is tokenized once per distribution pass; scoring shuffles only
   * (id, long) pairs into one groupBy(id). At 100 TB, fit both models on
   * samples — hashed-cell distributions saturate long before the corpus.
   *
   * Output: (idCol, n_grams, dsir_weight_fp); docs with no tokens weigh
   * 0 with n_grams = 0 (kept — vanishing rows would corrupt downstream
   * joins).
   */
  def dsirWeights(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 4096,
      scale: Long = 1L << 20): DataFrame =
    dsirScore(corpus, dsirModel(corpus, target, textCol, buckets, scale), idCol, textCol, buckets)

  /** The fit half of DSIR: the (cell, p_fp, q_fp) model table (≤ `buckets`
    * rows) from a raw and a target distribution. Fit once — on samples at
    * corpus scale — and hand to [[dsirScore]] (possibly many times, or to
    * a stream: the score side is stream-static-legal). Callers must score
    * with the SAME `buckets`. */
  def dsirModel(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = 4096,
      scale: Long = 1L << 20): DataFrame = {
    require(buckets >= 1 && scale >= 1, "dsirModel: buckets/scale must be >= 1")
    // One tokenization pass per distribution: tokens computed once, then
    // unigrams ++ bigrams from the same array.
    def grams(df: DataFrame): DataFrame =
      df.select(wordTokens(col(textCol)).as("t"))
        .select(explode(concat(col("t"), tokenNGrams(col("t"), 2))).as("g"))
        .select(graft.functions.shard_index(encode(col("g"), "UTF-8"), buckets).as("b"))
    val targetCells = grams(target).groupBy("b").agg(count(lit(1)).as("tc"))
    val rawCells = grams(raw).groupBy("b").agg(count(lit(1)).as("rc"))
    // DENSE model — one row for EVERY bucket, not just the observed ones:
    // a cell unseen in both distributions still has a well-defined
    // Laplace-smoothed probability pair (the OOV floor), and the apply
    // half scores corpora the model never saw (the fit-once deployment,
    // streaming included) without silently zeroing novel vocabulary.
    // Totals are GLOBAL-WINDOW SUMS over the dense joined table (≤
    // `buckets` rows in one task), NOT crossJoins against second
    // references of the cell tables: AQE stage reuse does not compose
    // transitively (LshBuckets.keyPartitioned), so the crossJoin layout
    // re-ran each distribution's tokenization pass twice — job-group
    // stage stats on text_dsir showed the raw-cells exchange's map stage
    // executing twice. One consumer per cell table = one tokenization
    // pass per distribution, structurally.
    val spark = raw.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    spark.range(buckets).select(col("id").cast("int").as("b"))
      .join(targetCells, Seq("b"), "left")
      .join(rawCells, Seq("b"), "left")
      .withColumn("tn", coalesce(sum(col("tc")).over(w), lit(0L)))
      .withColumn("rn", coalesce(sum(col("rc")).over(w), lit(0L)))
      .select(
        col("b"),
        expr(s"(coalesce(tc, 0L) + 1L) * ${scale}L div (tn + ${buckets}L)").as("p_fp"),
        expr(s"(coalesce(rc, 0L) + 1L) * ${scale}L div (rn + ${buckets}L)").as("q_fp"),
        // the model carries its own bucket count so the apply half can
        // verify it was handed the same hash space it was fitted in
        lit(buckets).as("nb"))
  }

  /** The apply half of DSIR: per-document weights under a fitted
    * [[dsirModel]]. Stream-static-legal (broadcast model join + one
    * stateful per-doc aggregation — the lmScore shape). */
  def dsirScore(
      corpus: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 4096): DataFrame = {
    // Null-sentinel gram per doc (the lmScore shape): every document
    // reaches the aggregation, so empty docs score 0 instead of
    // vanishing. NULL text must coalesce to an empty token array HERE:
    // wordTokens(NULL) is NULL, a NULL operand nulls the whole concat,
    // and explode(NULL) emits zero rows — the null-TEXT doc would
    // silently vanish (exactly the corruption the sentinel exists to
    // prevent) while the oracle's corpus-left-join keeps it at 0.
    corpus.select(col(idCol),
        coalesce(wordTokens(col(textCol)), array().cast("array<string>")).as("t"))
      .select(col(idCol),
        explode(concat(
          array(lit(null).cast("string")),
          col("t"),
          tokenNGrams(col("t"), 2))).as("g"))
      .withColumn("b",
        when(col("g").isNotNull,
          graft.functions.shard_index(encode(col("g"), "UTF-8"), buckets)))
      .join(broadcast(model), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("g")).as("n_grams"),
        // The model is DENSE over its bucket space and carries that
        // space's size (`nb`), so a real gram in a mismatched hash space
        // — bucket missing from the join (score buckets > fit), or nb
        // disagreeing with the score-side constant (score buckets < fit)
        // — would mean garbage weights; fail loud IN the plan instead.
        // The sentinel's null bucket is exempt.
        coalesce(sum(when(col("g").isNotNull,
          when(col("nb").isNull || col("nb") =!= lit(buckets),
            raise_error(concat(
              lit(s"dsirScore: bucket count mismatch — scoring with buckets=$buckets "),
              lit("but the model was fitted with "),
              coalesce(col("nb").cast("string"), lit("a smaller bucket space")))))
            .otherwise(col("p_fp") - col("q_fp")))), lit(0L))
          .as("dsir_weight_fp"))
  }

  /**
   * N-gram language-model quality score — the CCNet/KenLM pipeline step
   * (Wenzek et al. 2020): score each document by the average smoothed
   * bigram probability under a model trained on a reference corpus
   * (CCNet uses Wikipedia; pass any trusted split). High score = looks
   * like the reference distribution; filter or band by it (CCNet's
   * head/middle/tail buckets).
   *
   * All arithmetic is FIXED-POINT INTEGER so scores are bit-exact across
   * engines (the DuckDB oracle replays them): the Laplace-smoothed
   * probability of bigram g with prefix word w is
   * `p_fp = (c2(g) + 1) * scale div (c1(w) + vocab)` and the doc score
   * is `sum(p_fp) div n_bigrams` — no floating point anywhere. A true
   * log-space perplexity needs transcendental math whose last ULP
   * differs across engines; the average-probability formulation bands
   * documents the same way for filtering and stays hash-checkable.
   * BIGINT-safe while (c2+1) * scale < 2^63 — at the default scale=1e6 a
   * single bigram may occur 9.2e12 times before overflow (tighten scale
   * for bigger corpora).
   *
   * Scale shape: the model is two count tables capped at `maxGrams` rows
   * each by a distributed TakeOrdered (top by count, gram tie-break — a
   * deterministic eviction rule both engines replay; never a
   * single-task global window), broadcast to the probe side; evicted or
   * unseen grams fall to the smoothed floor, exactly like an OOV token.
   * Training pays one groupBy shuffle over the train grams (train on a
   * sample at 100 TB — the model saturates long before the corpus does);
   * scoring touches corpus text once and shuffles only (id, int) pairs
   * into the per-doc aggregation.
   *
   * Output: (idCol, n_bigrams, lm_score_fp); docs with < 2 tokens score
   * 0 with n_bigrams = 0 (kept, not dropped — vanishing rows would
   * corrupt downstream joins).
   */
  def lmScore(
      corpus: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String,
      maxGrams: Int = 1 << 20,
      vocab: Long = 1L << 16,
      scale: Long = 1000000L): DataFrame = {
    require(maxGrams >= 1, s"lmScore: maxGrams must be >= 1, got $maxGrams")
    require(vocab >= 1 && scale >= 1, s"lmScore: vocab/scale must be >= 1")
    val trainBigrams = train.select(explode(wordNGrams(col(textCol), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c2"))
      .orderBy(col("c2").desc, col("g")).limit(maxGrams)
    val trainPrefixes = train.select(explode(wordTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .orderBy(col("c1").desc, col("w")).limit(maxGrams)
    // A null SENTINEL gram is prepended per doc so every document reaches
    // the aggregation — count(p_fp) skips the sentinel's null score, and
    // short docs land at n_bigrams = 0 without a join back to the corpus
    // id list (one fewer shuffle than the aggregate-then-rejoin shape,
    // and the reason this exact operator also runs under Structured
    // Streaming: stream-static joins + one stateful agg, no
    // stream-to-its-own-aggregate self-join, which streaming forbids).
    corpus.select(col(idCol),
        explode(concat(array(lit(null).cast("string")), wordNGrams(col(textCol), 2))).as("g"))
      .withColumn("w", substring_index(col("g"), " ", 1))
      .join(broadcast(trainBigrams), Seq("g"), "left")
      .join(broadcast(trainPrefixes), Seq("w"), "left")
      .withColumn("c2n", coalesce(col("c2"), lit(0L)) + lit(1L))
      .withColumn("c1d", coalesce(col("c1"), lit(0L)) + lit(vocab))
      .select(col(idCol),
        when(col("g").isNotNull, expr(s"(c2n * ${scale}L) div c1d")).as("p_fp"))
      .groupBy(col(idCol))
      .agg(count(col("p_fp")).as("n_bigrams"), sum(col("p_fp")).as("p_sum"))
      .select(
        col(idCol),
        col("n_bigrams"),
        coalesce(expr("p_sum div n_bigrams"), lit(0L)).as("lm_score_fp"))
  }

  /**
   * Feature-hashed document embeddings (the "hashing trick", Weinberger
   * et al. 2009): word unigram+bigram features hashed into `dim` signed
   * cells — a model-free bridge from raw text into the vector stack
   * (semantic dedup, prototype pruning, kNN join, ANN indexes) when no
   * learned encoder is in the pipeline. The classic sparse-projection
   * guarantee: inner products of hashed vectors are unbiased estimates
   * of the inner products of the underlying (unbounded-vocab) gram-count
   * vectors, and the SIGN hash is what kills the collision bias.
   *
   * Cell = the engine's md5-mod routing over the gram bytes (byte-
   * replayable in SQL — the DSIR precedent); sign = md5-mod-2 of the
   * gram with a salt suffix (an independent hash bit, same routing
   * kernel). Weights are exact integer signed counts. Two surfaces:
   *  - [[featureHashEmbed]]: exploded (id, cell, w) rows for nonzero
   *    cells — the oracle-friendly sparse form;
   *  - [[featureHashVector]]: dense `array<double>` of length `dim` per
   *    doc (docs with no grams get the zero vector, which the vector
   *    stack's norm>0 guards already treat as "unclustered, keep") —
   *    plug-compatible with every `vecCol` operator.
   * Scale: one tokenize + explode + groupBy((id, cell)) partial agg —
   * gram rows never carry text, only (id, cell, ±1). Assembly of the
   * dense form is a per-doc map fill over `dim` entries.
   */
  def featureHashEmbed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64): DataFrame = {
    require(dim >= 1, "featureHashEmbed: dim must be >= 1")
    df.select(col(idCol), wordTokens(col(textCol)).as("t"))
      .select(col(idCol),
        explode(concat(col("t"), tokenNGrams(col("t"), 2))).as("g"))
      .select(
        col(idCol),
        graft.functions.shard_index(encode(col("g"), "UTF-8"), dim).as("cell"),
        // independent sign bit: same md5 kernel, salted gram ('#' cannot
        // appear in wordTokens output, so the salted space is disjoint)
        (graft.functions.shard_index(encode(concat(col("g"), lit("#s")), "UTF-8"), 2)
          .cast("long") * 2L - 1L).as("sgn"))
      .groupBy(col(idCol), col("cell"))
      .agg(sum(col("sgn")).as("w"))
      .where(col("w") =!= 0L)
  }

  /** Dense form of [[featureHashEmbed]] — (idCol, emb: array<double>).
    * Every input doc gets a row; gramless docs get the zero vector. */
  def featureHashVector(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64): DataFrame = {
    // dense assembly through the codegen scatter kernel: the HOF
    // formulation (transform(sequence(0, dim-1), i -> m[i]) with a
    // linear map probe per cell) is O(dim x nnz) INTERPRETED work per
    // document — ruinous at DSIR-style dims; the kernel is one
    // O(nnz + dim) pass inside whole-stage codegen
    val sparse = featureHashEmbed(df, idCol, textCol, dim)
      .groupBy(col(idCol))
      .agg(collect_list(struct(
        col("cell").cast("int").as("cell"), col("w").cast("long").as("w"))).as("_s"))
    df.select(col(idCol))
      .join(sparse, Seq(idCol), "left")
      .select(
        col(idCol),
        graft.functions.dense_scatter(
          coalesce(col("_s"), array().cast("array<struct<cell:int,w:bigint>>")), dim)
          .as("emb"))
  }

  /** Language-ID report: per-language marker scores + predicted language. */
  def langIdReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val scored = LangMarkers.foldLeft(df.select(col(idCol), t)) { case (d, (lang, _)) =>
      d.withColumn(s"score_$lang", langScore(t, lang).cast("long"))
    }
    scored
      .withColumn(
        "lang_pred",
        langId(LangMarkers.map { case (l, _) => l -> col(s"score_$l") }.toMap))
      .drop(textCol)
  }
}
