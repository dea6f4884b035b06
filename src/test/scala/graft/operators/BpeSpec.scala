package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Real-BPE train/apply — verified against an independent naive
  * reimplementation (no SQL oracle: iterative merge training cannot be
  * expressed as a static SQL string; this spec is the verification
  * surface, like the other trained operators' property pins). */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  private val corpusText = Seq(
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest lowly newly",
    "the lowest of the low the newest of the new")

  private def corpus = corpusText.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Independent naive replay: same contract, different code — pair
    * counting over (word, freq) maps with max-count/lexicographic-tie
    * selection, then naive per-word merging. */
  private def naiveTrain(
      words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    def split(w: String): List[String] =
      w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))
    var vocab: Seq[(List[String], Long)] = words.map { case (w, f) => (split(w), f) }
    var merges = List.empty[(String, String)]
    for (_ <- 0 until numMerges if vocab.exists(_._1.size >= 2)) {
      val counts = vocab.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.nonEmpty) {
        val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges :+= best
        vocab = vocab.map { case (syms, f) =>
          // naive left-to-right re-segmentation
          def go(rest: List[String], acc: List[String]): List[String] = rest match {
            case a :: b :: t if (a, b) == best => go(t, acc :+ (a + b))
            case a :: t => go(t, acc :+ a)
            case Nil => acc
          }
          (go(syms, Nil), f)
        }
      }
    }
    merges
  }

  test("train == independent naive replay; deterministic across runs") {
    val wordFreqs = corpusText
      .flatMap(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.toArray
    val m1 = Bpe.train(corpus, "text", numMerges = 12)
    val m2 = Bpe.train(corpus, "text", numMerges = 12)
    assert(m1.pairs === m2.pairs, "training must be deterministic")
    assert(m1.pairs === naiveTrain(wordFreqs.toSeq, 12).toIndexedSeq)
    assert(m1.pairs.nonEmpty)
    // frequent substrings became single tokens
    val joined = m1.pairs.map { case (a, b) => a + b }
    assert(joined.exists(t => t.length >= 3), s"no multi-char merges in $joined")
  }

  test("apply: round-trip, lowest-rank-first, distributed kernel == driver loop") {
    val merges = Bpe.train(corpus, "text", numMerges = 10)
    // every word reassembles from its tokens
    val words = corpusText.flatMap(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase)).distinct
    words.foreach { w =>
      val toks = Bpe.tokenizeWord(w, merges)
      assert(toks.mkString === w, s"round-trip failed for '$w'")
      assert(toks.forall(_.nonEmpty))
    }
    // distributed kernel (codegen expression) equals the driver loop
    val viaKernel = Bpe.tokenCounts(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    corpusText.zipWithIndex.foreach { case (t, i) =>
      val ws = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
      val nTok = ws.map(w => Bpe.tokenizeWord(w, merges).length).sum
      assert(viaKernel(i.toLong) === ((ws.size.toLong, nTok.toLong)), s"doc $i")
    }
    // a merge table actually compresses: fewer tokens than characters
    val totalChars = words.map(_.length).sum
    val totalToks = words.map(w => Bpe.tokenizeWord(w, merges).length).sum
    assert(totalToks < totalChars)
    // histogram totals == token totals
    val hist = Bpe.tokenHistogram(corpus, "text", merges)
      .agg(sum(col("cnt"))).head().getLong(0)
    assert(hist === viaKernel.values.map(_._2).sum)
  }

  test("codepoint safety: non-BMP symbols never split mid-surrogate") {
    val merges = Bpe.Merges(Vector(("a", "b")))
    val toks = Bpe.tokenizeWord("𝕋ab𝕋", merges) // 𝕏ab𝕏
    assert(toks.toSeq === Seq("𝕋", "ab", "𝕋"))
    // empty and single-symbol words pass through
    assert(Bpe.tokenizeWord("", merges).isEmpty)
    assert(Bpe.tokenizeWord("x", merges).toSeq === Seq("x"))
    // an empty merge table = pure codepoint split
    val none = Bpe.Merges(Vector.empty)
    assert(Bpe.tokenizeWord("ab", none).toSeq === Seq("a", "b"))
  }
}
