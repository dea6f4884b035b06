package graft.store

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/**
 * Spark-free ranked retrieval — the full-text completion of
 * [[KvDomainReader]] beside [[AnnReader]]: BM25 top-k answered from a
 * PUBLISHED search-index domain (`Search.invertedIndexKv`) with zero
 * Spark on the classpath. Build with Spark, serve from any JVM — the
 * reference daemon's resource profile (route + point lookups,
 * `elephantdb-thrift/src/thrift/core.thrift:6-8`) applied to search.
 *
 * A query costs: one postings point lookup per distinct query term
 * (per-shard binary search), one BATCHED doc-length multiGet over the
 * candidates (density-adaptive inside [[KvDomainReader.multiGet]]), and
 * an in-memory integer scoring pass. Scoring is [[SearchLayout.contrib]]
 * — the same exact integer the Spark plan computes, so served results
 * are BIT-IDENTICAL to `Search.searchTopK` over the same domain (pinned
 * in SearchSpec).
 *
 * Thread-safety follows [[KvDomainReader]]: concurrent `topK` calls are
 * safe.
 */
final class SearchReader(val index: KvDomainReader) extends AutoCloseable {

  import SearchLayout._

  private def utf8(s: String): Array[Byte] = s.getBytes(UTF_8)
  private def str(b: Array[Byte]): String = new String(b, UTF_8)

  private val (nDocs: Long, totalToks: Long) = ReaderGate(index) {
    // positional domains publish m:stats too (ranked fusion) — the type
    // marker, not stats presence, decides; a positional domain here
    // would otherwise serve silently empty rankings (no t: keys). Gate
    // failures close the handed-in reader first (ReaderGate — the
    // family-wide ownership rule).
    if (index.get(utf8(PosMetaKey)).isDefined)
      throw new IllegalStateException(
        s"'$PosMetaKey' marker present — this is a positional-index domain; " +
          "phrase serving is PhraseReader, BM25 needs an invertedIndexKv domain")
    val raw = index.get(utf8(MetaKey)).getOrElse(throw new IllegalStateException(
      s"not a search-index domain: no '$MetaKey' record (build with " +
        "Search.invertedIndexKv)"))
    val parts = str(raw).split(",")
    (parts(0).toLong, parts(1).toLong)
  }

  /** Corpus-level constants, as published. */
  def stats: (Long, Long) = (nDocs, totalToks)

  /** Top-k (docId, score) for a free-text query, score descending, ties
    * to the lower doc id — `Search.searchTopK`'s exact ranking. Terms
    * absent from the index (unseen, or dropped by the postings cap)
    * contribute nothing. */
  def topK(query: String, k: Int): Seq[(Long, Long)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ts = terms(query)
    if (ts.isEmpty) return Nil
    val postings = index.multiGet(ts.map(t => utf8(TermPrefix + t)))
    // candidate -> its (df, tf) hits across query terms
    val perDoc = mutable.LinkedHashMap.empty[Long, mutable.ListBuffer[(Long, Long)]]
    postings.foreach {
      case None => ()
      case Some(v) =>
        val entries = str(v).split(",")
        val df = entries.length.toLong
        entries.foreach { e =>
          val sep = e.indexOf(':')
          val id = e.substring(0, sep).toLong
          val tf = e.substring(sep + 1).toLong
          perDoc.getOrElseUpdate(id, mutable.ListBuffer.empty) += ((df, tf))
        }
    }
    if (perDoc.isEmpty) return Nil
    val ids = perDoc.keys.toArray.sorted // sorted batch: merge-scan friendly
    val lens = index.multiGet(ids.toIndexedSeq.map(id => utf8(DocPrefix + id)))
    val scored = ids.iterator.zip(lens.iterator).map { case (id, lenOpt) =>
      val len = str(lenOpt.getOrElse(throw new IllegalStateException(
        s"searchTopK: candidate doc $id has no length record — the index " +
          "is corrupt (postings and doc records must publish together)"))).toLong
      val score = perDoc(id).iterator
        .map { case (df, tf) => contrib(nDocs, totalToks, df, tf, len) }
        .sum
      (id, score.toLong)
    }.toIndexedSeq
    scored.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  def close(): Unit = index.close()
}
