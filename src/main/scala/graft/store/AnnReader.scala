package graft.store

import java.nio.charset.StandardCharsets

/**
 * Spark-free ANN serving — the vector-search completion of
 * [[KvDomainReader]]: top-k approximate nearest neighbors answered from
 * two PUBLISHED kv-sorted domains with zero Spark on the classpath.
 *
 *  - `postings`: the PQ-coded inverted index
 *    (`Similarity.ivfPqIndexKv` — key = big-endian cell id, value =
 *    `id:c0.c1...` entries, ascending, comma-joined);
 *  - `vectors`: the raw vectors for exact re-rank
 *    (`Similarity.vectorKv` — key = big-endian id, value =
 *    [[VectorCodec]]-packed doubles).
 *
 * A query costs: one in-memory argmin over the quantizer (nprobe
 * cells), nprobe posting-list point lookups (per-shard binary search,
 * bloom-killed misses), an ADC pass over the candidates' CODES (m
 * float-adds each, no vector bytes touched), and k·rerank vector point
 * lookups for the exact cosine re-rank — the reference daemon's
 * resource profile applied to vector search: build with Spark, serve
 * from any JVM.
 *
 * Every arithmetic step replicates the engine's kernels exactly —
 * cell scores `|c|^2 - 2(v·c)` with strict left-to-right sums and
 * lower-cell-id ties ([[graft.core]] NearestCellsKernel), ADC sums in
 * subspace order, shortlist by (adc, id), final rank by (cos desc, id)
 * — so the served result is BIT-IDENTICAL to
 * `Similarity.ivfPqSearchIndex` over the same domains (pinned in
 * AnnReaderSpec).
 *
 * Thread safety follows the underlying readers: concurrent `topK`
 * calls are safe (positioned reads; the merge-scan branch opens its
 * own handles).
 */
final class AnnReader(
    val postings: KvDomainReader,
    val vectors: KvDomainReader,
    centroids: Array[Array[Double]],
    books: Array[Array[Array[Double]]]) extends AutoCloseable {

  // gates + derived fields run under ReaderGate: any failure closes BOTH
  // handed-in readers before the throw (the family-wide ownership rule —
  // a daemon retrying against a mid-deploy domain must not leak two
  // shard-handle sets per attempt). The postings gate replicates
  // IndexMarker.requireSpecIn Spark-free: a DECLARED index type must be
  // the PQ posting-list family (a wrong aim would serve silently-empty
  // topK); undeclared (pre-field/legacy) specs pass, like every spec-only
  // gate.
  private val (norms: Array[Double], m: Int, ksub: Int, dsub: Int) = ReaderGate(postings, vectors) {
    postings.spec.indexTypeOption.foreach { t =>
      if (t != AnnReader.IndexType) throw new IllegalArgumentException(
        s"AnnReader: postings domain declares index type '$t', not " +
          s"'${AnnReader.IndexType}' — this reader serves ivfPqIndexKv domains only")
    }
    require(centroids.nonEmpty && books.nonEmpty, "empty quantizer")
    require(books.forall(_.nonEmpty) && books.forall(_.forall(_.nonEmpty)),
      "ragged codebooks: every subspace needs non-empty centroids")
    (centroids.map(_.map(x => x * x).sum), books.length, books(0).length, books(0)(0).length)
  }

  /** The `nprobe` nearest cells by `|c|^2 - 2(v·c)` (the |v|^2 term is
    * constant per query), ascending score, ties to the lower cell id —
    * NearestCellsKernel's insertion order replayed. */
  private def nearestCells(q: Array[Double], nprobe: Int): Array[Int] = {
    val k = centroids.length
    val n = math.min(nprobe, k)
    val bestScore = new Array[Double](n)
    val bestCell = new Array[Int](n)
    var filled = 0
    var c = 0
    while (c < k) {
      val ctr = centroids(c)
      require(ctr.length == q.length,
        s"query dim ${q.length} != centroid dim ${ctr.length}")
      var s = 0.0
      var i = 0
      while (i < q.length) { s += q(i) * ctr(i); i += 1 }
      val score = norms(c) - 2.0 * s
      var pos = filled
      while (pos > 0 && score < bestScore(pos - 1)) pos -= 1
      if (pos < n) {
        val last = math.min(filled, n - 1)
        var j = last
        while (j > pos) { bestScore(j) = bestScore(j - 1); bestCell(j) = bestCell(j - 1); j -= 1 }
        bestScore(pos) = score
        bestCell(pos) = c
        if (filled < n) filled += 1
      }
      c += 1
    }
    bestCell.take(filled)
  }

  /** Per-query ADC lookup table — same loops as the engine's adcLuts. */
  private def lut(q: Array[Double]): Array[Double] = {
    val t = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val book = books(s)
      var code = 0
      while (code < book.length) {
        val ctr = book(code)
        var d = 0.0
        var i = 0
        while (i < dsub) { val x = q(s * dsub + i) - ctr(i); d += x * x; i += 1 }
        t(s * ksub + code) = d
        code += 1
      }
      s += 1
    }
    t
  }

  /**
   * Top-k neighbors of `query`, `(neighbor_id, rank)` with rank 1..k —
   * `Similarity.ivfPqSearchIndex`'s exact output for the same tensors
   * and parameters. `excludeId` drops one id from the candidates (the
   * self-exclusion the corpus-query pipelines apply).
   */
  def topK(
      query: Array[Double],
      k: Int,
      nprobe: Int = 4,
      rerank: Int = 4,
      excludeId: Option[Long] = None): IndexedSeq[(Long, Int)] = {
    // zero-norm query: the Spark pipeline's prepared() drops it (its
    // cosine is 0/0 against everything) and returns NO rows — serve the
    // same empty answer, never Infinity-ranked garbage
    var qn0 = 0.0
    var q0 = 0
    while (q0 < query.length) { qn0 += query(q0) * query(q0); q0 += 1 }
    if (qn0 == 0.0) return IndexedSeq.empty
    val cells = nearestCells(query, nprobe)
    val posts = postings.multiGet(cells.toIndexedSeq.map(VectorCodec.intBe))
    val table = lut(query)
    val scored = for {
      blob <- posts.flatten
      entry <- new String(blob, StandardCharsets.UTF_8).split(",")
      if entry.nonEmpty
      sep = entry.indexOf(':')
      _ = require(sep > 0,
        s"AnnReader: posting entry '$entry' has no ':' — the postings domain is not a " +
          "PQ-coded index (ivfPqIndexKv). A plain ivfIndexKv domain cannot serve ADC; " +
          "check the constructor's (postings, vectors) roots are not swapped.")
      id = entry.substring(0, sep).toLong
      if !excludeId.contains(id)
    } yield {
      val codes = entry.substring(sep + 1).split("\\.")
      var s = 0.0
      var i = 0
      while (i < m) { s += table(i * ksub + codes(i).toShort); i += 1 }
      (id, s)
    }
    val shortlist = scored.sortBy { case (id, adc) => (adc, id) }.take(k * rerank)
    val qnorm = math.sqrt(qn0) // the guard's sum, already proven nonzero
    val reranked = shortlist.zip(vectors.multiGet(shortlist.map(e => VectorCodec.longBe(e._1))))
      .collect { case ((id, _), Some(blob)) =>
        val v = VectorCodec.unpack(blob)
        var dot = 0.0
        var nv = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * query(i); i += 1 }
        i = 0
        while (i < v.length) { nv += v(i) * v(i); i += 1 }
        // cos = dot / (norm_v * norm_q), the engine's operand order
        (id, dot / (math.sqrt(nv) * qnorm))
      }
    reranked.sortBy { case (id, cos) => (-cos, id) }
      .take(k)
      .zipWithIndex
      .map { case ((id, _), i) => (id, i + 1) }
  }

  override def close(): Unit =
    try postings.close()
    finally vectors.close()
}

object AnnReader {
  /** The ivf-pq posting-list index-type authority string — defined HERE
    * (Spark-free) so the serving reader never loads the Spark-heavy
    * operators package; `graft.operators.Similarity.IvfPqIndexType`
    * aliases it (one definition, the OverlapReader.IndexType pattern). */
  val IndexType = "ivf-pq-postings"
}
