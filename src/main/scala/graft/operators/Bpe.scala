package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Real byte-pair-encoding tokenization (Sennrich et al. 2016, the
 * subword scheme behind GPT/Llama-family vocabularies) — train a merge
 * table on the corpus, apply it distributed. This upgrades the engine's
 * token accounting from the regex approximation
 * ([[TextAnalysis.bpeTokenCount]]) to an actual learned subword
 * vocabulary: token budgets, packing lengths, and per-source mixing all
 * key off "tokens" and a real tokenizer prices them like a training run
 * would.
 *
 * Training is driver-side on a BOUNDED word-frequency sample — the
 * [[Similarity]] quantizer layout: merge statistics saturate on the
 * most-frequent words long before a corpus does, so the distributed
 * side is ONE word-count aggregation (map-side combined) capped by a
 * deterministic TakeOrdered, and the merge loop runs on ≤ maxTrainWords
 * (word, freq) pairs with exact integer counts. Everything is
 * deterministic: ties on pair count break lexicographically, so the
 * merge table is a pure function of the corpus.
 *
 * Application is a per-row kernel ([[graft.core.BpeSegmentExpr]],
 * codegen'd like every other custom kernel here): words split to
 * CODEPOINT symbols (a `charAt` loop would split surrogate pairs and
 * silently produce different tokens after the first non-BMP char —
 * CLAUDE.md's Anchors regression), then the standard lowest-rank-first
 * merge loop per word. The merge table rides a broadcast.
 *
 * Verification: no SQL oracle — replaying an iterative merge-table
 * train/apply needs loops SQL cannot express statically (the same
 * reason the reference-free trained quantizers ship `_fixed` twins).
 * Instead BpeSpec pins train+apply against an independent naive
 * reimplementation, round-trip (concatenating a word's tokens restores
 * the word), determinism, and codepoint handling; the contract queries
 * keep using the oracled regex approximation.
 */
object Bpe {

  /** Driver-work ceiling for [[trainOnFreqs]] (numMerges x sample
    * symbols — each merge recounts every adjacent pair): 2e9 boxed
    * HashMap operations is minutes on one core; past it the trainer
    * fails loud instead of spinning for hours. */
  val MaxTrainWork: Long = 2_000_000_000L

  /** A learned merge table: pairs in rank order (rank 0 merges first). */
  final case class Merges(pairs: IndexedSeq[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] = pairs.zipWithIndex.toMap

    // One broadcast per table per CONTEXT (CLAUDE.md's share-one-broadcast
    // rule): tokenCounts + tokenHistogram over one corpus must not ship
    // the table twice. Keyed by SparkContext identity — a Merges trained
    // in one session and reused after a context restart would otherwise
    // hand out a broadcast whose blocks belong to the dead context
    // ("Failed to get broadcast" at job time). Transient so a shipped
    // Merges never drags a driver-side broadcast handle along.
    @transient private var bcCache: org.apache.spark.broadcast.Broadcast[Merges] = _
    @transient private var bcCtx: org.apache.spark.SparkContext = _
    private[graft] def broadcastWith(
        spark: org.apache.spark.sql.SparkSession)
        : org.apache.spark.broadcast.Broadcast[Merges] = synchronized {
      val sc = spark.sparkContext
      if (bcCache == null || (bcCtx ne sc)) {
        bcCache = sc.broadcast(this)
        bcCtx = sc
      }
      bcCache
    }
  }

  /**
   * Learn `numMerges` merges from the corpus's word distribution.
   * Distributed cost: one tokenize + word count aggregation; the
   * TakeOrdered cap bounds the driver at `maxTrainWords` (word, freq)
   * rows ordered by (freq desc, word) — deterministic, so two runs over
   * one corpus learn identical tables.
   */
  def train(
      corpus: DataFrame,
      textCol: String,
      numMerges: Int,
      maxTrainWords: Int = 65536): Merges = {
    require(numMerges >= 0, "bpe train: numMerges must be >= 0")
    val freqs = corpus
      .select(explode(TextAnalysis.wordTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxTrainWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    Merges(trainOnFreqs(freqs, numMerges))
  }

  /** The driver merge loop on explicit (word, freq) pairs — exposed for
    * the spec's independent replay. */
  private[graft] def trainOnFreqs(
      freqs: Array[(String, Long)],
      numMerges: Int): IndexedSeq[(String, String)] = {
    // words as codepoint-symbol vectors; merges rewrite these in place
    var vocab: Array[(Array[String], Long)] =
      freqs.map { case (w, f) => (codepoints(w), f) }
    // Work-calibrated bound (the AuditBound convention — loud, never a
    // silent hang): each merge iteration recounts every adjacent pair
    // over the whole sample vocabulary, so total driver work is
    // ~numMerges x totalSymbols. A GPT-scale table (32k merges) over the
    // default 65k-word sample is ~10^10 boxed HashMap ops — hours of
    // silent driver spin. Past the cap the trainer refuses and names the
    // levers; incremental pair-count maintenance is the real fix if a
    // caller ever needs that scale in-process.
    val totalSymbols = vocab.iterator.map(_._1.length.toLong).sum
    require(numMerges.toLong * math.max(totalSymbols, 1L) <= MaxTrainWork,
      s"bpe train: numMerges=$numMerges x $totalSymbols sample symbols = " +
        s"${numMerges.toLong * totalSymbols} pair-count operations, past the " +
        s"$MaxTrainWork driver-work bound (~minutes) — lower numMerges or " +
        "maxTrainWords, or train out-of-process")
    val out = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties lexicographic — a total order, so deterministic
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        vocab = vocab.map { case (syms, f) => (mergePair(syms, best), f) }
        m += 1
      }
    }
    out.result()
  }

  /** Merge every left-to-right occurrence of `pair` in one symbol run. */
  private[graft] def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Codepoint symbols — NOT `charAt` units (surrogate safety). */
  private[graft] def codepoints(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Tokenize one word under a merge table: repeatedly merge the
    * LOWEST-RANK adjacent pair (leftmost occurrence first) until no
    * learned pair remains — the standard BPE apply. */
  def tokenizeWord(word: String, merges: Merges): Array[String] = {
    var syms = codepoints(word)
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = merges.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        syms = mergePair(syms, merges.pairs(bestRank))
        continue = syms.length >= 2
      }
    }
    syms
  }

  /** BPE tokens of a text column (one flat array per row, word-major
    * order) — the per-row kernel over [[TextAnalysis.wordTokens]]. */
  def tokens(text: Column, merges: Merges, spark: org.apache.spark.sql.SparkSession): Column =
    tokensFromWords(TextAnalysis.wordTokens(text), merges, spark)

  /** The BPE kernel over an already-tokenized word array — callers that
    * need both the word array and its BPE segmentation tokenize once. */
  def tokensFromWords(
      words: Column, merges: Merges, spark: org.apache.spark.sql.SparkSession): Column = {
    import org.apache.spark.sql.graft.interop
    interop.column(graft.core.BpeSegmentExpr(
      interop.expression(words), merges.broadcastWith(spark)))
  }

  /** Per-document BPE accounting: (idCol, n_words, n_bpe_tokens) —
    * the learned-vocab replacement for the regex token estimate.
    * Tokenizes ONCE in a first projection (the CSE-independence pattern
    * from [[TextAnalysis.repetitionReport]] — the flat form ran the
    * tokenizer twice per row, once inside the kernel and once for
    * n_words). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String, merges: Merges): DataFrame = {
    // staging-alias collision guard (the _bsz precedent; the pre-r11
    // flat form had no internal alias, so "w" would regress silently)
    require(idCol != "w",
      "tokenCounts: id column 'w' collides with the internal word-array " +
        "staging alias — rename the id column")
    df.select(col(idCol), TextAnalysis.wordTokens(col(textCol)).as("w"))
      .select(
        col(idCol),
        size(col("w")).cast("long").as("n_words"),
        size(tokensFromWords(col("w"), merges, df.sparkSession)).cast("long").as("n_bpe_tokens"))
  }

  /** Corpus token histogram under the learned vocabulary: (token, cnt),
    * the "what does my vocab actually look like" report. One explode +
    * one partial-agg count. */
  def tokenHistogram(df: DataFrame, textCol: String, merges: Merges): DataFrame =
    df.select(explode(tokens(col(textCol), merges, df.sparkSession)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
}
