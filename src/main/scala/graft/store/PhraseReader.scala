package graft.store

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Spark-free exact phrase search — the positional completion of
 * [[SearchReader]]: consecutive-token retrieval answered from a
 * PUBLISHED positional-index domain (`Search.positionalIndexKv`) with
 * zero Spark on the classpath. Build with Spark, serve from any JVM —
 * and since the positional domain's values are position CSV, it is the
 * natural tenant of the block-compressed `kv-sorted-z` engine: this
 * reader decompresses one block per probed posting through the same
 * magic-sniffed [[KvFile.open]] every kv consumer shares.
 *
 * A query costs: one tombstone probe + one postings point lookup per
 * distinct term (per-shard binary search), then an in-memory anchor
 * intersection. Results are BIT-IDENTICAL to `Search.phraseSearch` over
 * the same domain — same anchor-voting semantics (`matches(d, a) ⇔ ∀j:
 * term_j occurs in d at a + j`), same (n_matches desc, doc id) ranking
 * (pinned in SearchSpec).
 *
 * Thread-safety follows [[KvDomainReader]]: concurrent `phrase` calls
 * are safe.
 */
final class PhraseReader(val index: KvDomainReader) extends AutoCloseable {

  import SearchLayout._

  private def utf8(s: String): Array[Byte] = s.getBytes(UTF_8)
  private def str(b: Array[Byte]): String = new String(b, UTF_8)

  // type guard at open: a BM25 domain (which also has d: records) would
  // otherwise answer every phrase with a silent empty. Gate failures
  // close the handed-in reader first (ReaderGate — under the
  // `new PhraseReader(KvDomainReader.open(...))` idiom the caller holds
  // no other reference, so an open reader per failed construction is a
  // shard-handle leak).
  ReaderGate(index) {
    require(index.get(utf8(PosMetaKey)).isDefined,
      s"PhraseReader: no '$PosMetaKey' record — not a positional-index domain " +
        "(build with Search.positionalIndexKv)")
  }

  /** Top-k (docId, nMatches) for an exact phrase, occurrence count
    * descending, ties to the lower doc id. A term the build tombstoned
    * fails loud (phrase semantics cannot elide a term); a term simply
    * absent yields zero matches. */
  def phrase(query: String, k: Int): Seq[(Long, Long)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = tokens(query)
    if (toks.isEmpty) return Nil
    val distinctTerms = toks.distinct
    // ONE batched lookup round for tombstones AND postings: each probed
    // shard is visited once per call, not twice
    val lookups = index.multiGet(
      distinctTerms.map(t => utf8(DroppedPrefix + t)) ++
        distinctTerms.map(t => utf8(PosPrefix + t)))
    lookups.take(distinctTerms.size)
      .zip(distinctTerms)
      .collectFirst { case (Some(_), t) => t }
      .foreach { t =>
        throw new IllegalArgumentException(
          s"phrase: query term '$t' was dropped by the build-time postings cap — " +
            "phrase semantics cannot elide a term; rebuild the positional index " +
            "with a higher maxPostings")
      }
    // term -> (docId -> position set)
    val postings: Map[String, Map[Long, Set[Long]]] =
      lookups.drop(distinctTerms.size)
        .zip(distinctTerms)
        .collect { case (Some(v), t) =>
          t -> str(v).split(",").map { e =>
            val sep = e.indexOf(':')
            e.substring(0, sep).toLong ->
              e.substring(sep + 1).split(";").map(_.toLong).toSet
          }.toMap
        }.toMap
    // candidate docs: those containing EVERY phrase term
    val perTerm = toks.map(t => postings.getOrElse(t, Map.empty[Long, Set[Long]]))
    if (perTerm.exists(_.isEmpty)) return Nil
    val docs = perTerm.map(_.keySet).reduce(_ intersect _)
    val matched = docs.toSeq.flatMap { d =>
      // anchors come from offset 0's positions; each must hold every offset
      val n = perTerm.head(d).count { a =>
        perTerm.indices.forall(j => perTerm(j)(d).contains(a + j))
      }
      if (n > 0) Some(d -> n.toLong) else None
    }
    matched.sortBy { case (id, n) => (-n, id) }.take(k)
  }

  def close(): Unit = index.close()
}
