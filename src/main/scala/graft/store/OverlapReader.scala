package graft.store

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Spark-free verbatim-overlap probe — the serving half of the published
 * anchored-fingerprint index ([[graft.operators.Dedup.fpIndexKv]]),
 * beside [[AnnReader]]/[[SearchReader]]/[[PhraseReader]]: "does this
 * incoming document share an exact >= `minLen`-codepoint run with the
 * indexed corpus, and with WHICH docs?" answered on any JVM with zero
 * Spark on the classpath — the admission-time contamination /
 * boilerplate-provenance check a serving box runs per document.
 *
 * A probe costs: one O(len) rolling anchor pass over the text
 * ([[graft.core.AnchorMath]] — the EXACT kernel the Spark build ran, one
 * definition, so probe and index can never fingerprint differently), one
 * md5 per anchor (~len/modulus of positions), and ONE batched
 * [[KvDomainReader.multiGet]] over the fingerprint keys
 * (density-adaptive per shard; bloom sidecars answer definite misses
 * with zero data I/O when the domain was published with an indexer).
 * No verify stage exists or is needed — a fingerprint hit IS a shared
 * `minLen`-codepoint run (md5 over the same characters on both sides).
 *
 * `minLen`/`window`/`modulus` MUST match the index build's (they shape
 * the fingerprints themselves); the defaults are the build's defaults.
 *
 * Thread-safety follows [[KvDomainReader]]: concurrent probes are safe.
 */
final class OverlapReader(
    val index: KvDomainReader,
    minLen: Int = 64,
    window: Int = 8,
    modulus: Int = 16) extends AutoCloseable {

  // Index-type gate, Spark-free: the spec field is the authority
  // (declared at store creation); pre-field domains fall back to the
  // in-data m:index-type marker — one point lookup. Either way a wrong
  // family (or bad geometry) fails loud here, never as silently-empty
  // probes — and ANY gate failure closes the handed-in reader first
  // (ReaderGate: the family-wide ownership rule).
  ReaderGate(index) {
    require(window >= 1 && window <= minLen,
      s"anchor window $window must be in [1, minLen=$minLen]")
    require(modulus >= 1, s"modulus must be >= 1, got $modulus (1 anchors everywhere)")
    val expected = OverlapReader.IndexType
    index.spec.indexTypeOption match {
      case Some(t) if t == expected => ()
      case Some(other) => throw new IllegalArgumentException(
        s"OverlapReader: domain is a '$other' index, not '$expected' — " +
          "this reader serves fpIndexKv domains only")
      case None =>
        val marker = index.get("m:index-type".getBytes(UTF_8)).map(new String(_, UTF_8))
        if (!marker.contains(expected)) throw new IllegalArgumentException(
          s"OverlapReader: domain carries index-type ${marker.getOrElse("<none>")}, " +
            s"not '$expected' — not built by fpIndexKv (or a pre-marker build)")
    }
  }

  /** The text's anchored fingerprint keys (16 raw md5 bytes each,
    * distinct) — exactly the keys `fpIndexKv` would publish for it. */
  def fingerprints(text: String): IndexedSeq[Array[Byte]] = {
    val cps = text.codePoints().toArray
    if (cps.length < minLen) return IndexedSeq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val maxPos = cps.length - (minLen - 1)
    val out = IndexedSeq.newBuilder[Array[Byte]]
    val seen = scala.collection.mutable.HashSet.empty[scala.collection.immutable.ArraySeq[Byte]]
    graft.core.AnchorMath.positions(cps, window, modulus).foreach { pos =>
      if (pos <= maxPos) {
        // Spark's md5(substring(...)) hashes the UTF-8 bytes of the
        // codepoint substring — replicate byte-for-byte
        md.reset()
        val digest = md.digest(new String(cps, pos - 1, minLen).getBytes(UTF_8))
        if (seen.add(scala.collection.immutable.ArraySeq.unsafeWrapArray(digest)))
          out += digest
      }
    }
    out.result()
  }

  /** Indexed corpus docs sharing at least one anchored >= minLen-run
    * with `text`, ascending. Empty = no detected overlap (same recall
    * characteristics as the build-side detector: exact at the
    * fingerprint level, probabilistic in run length via anchor density,
    * minus publish-time cap-dropped corpus-wide boilerplate). */
  def overlapping(text: String): IndexedSeq[Long] = {
    val fps = fingerprints(text)
    if (fps.isEmpty) return IndexedSeq.empty
    index.multiGet(fps).iterator
      .collect { case Some(v) => new String(v, UTF_8) }
      // a cap-tombstoned fingerprint is a MISS (publish-time corpus-wide
      // boilerplate — the Spark probe's documented cap semantics)
      .filter(_ != graft.core.IndexTombstone.Value)
      .flatMap(_.split(','))
      .map(_.toLong)
      .toIndexedSeq.distinct.sorted
  }

  /** Convenience admission check: true iff the text shares an anchored
    * run with any indexed doc. */
  def isContaminated(text: String): Boolean = overlapping(text).nonEmpty

  /** Batched admission — [[overlapping]] for a STREAM of documents in
    * ONE index round: all docs' fingerprints dedup across the batch
    * (shared boilerplate fingerprints once, not once per carrier) into a
    * single [[KvDomainReader.multiGet]], whose one generation pin is the
    * version-consistency stamp for the whole batch — every answer row
    * reflects the SAME served version, the daemon's chunked-batch
    * contract. Answers align with the input; each is exactly what
    * [[overlapping]] would return for that text (OverlapReaderSpec pins
    * the equivalence on a mixed hit/clean/non-BMP batch). */
  def overlappingAll(texts: Seq[String]): IndexedSeq[IndexedSeq[Long]] = {
    import scala.collection.immutable.ArraySeq
    val perDoc = texts.map(fingerprints)
    val uniq = scala.collection.mutable.LinkedHashMap.empty[ArraySeq[Byte], Array[Byte]]
    perDoc.foreach(_.foreach(k => uniq.getOrElseUpdate(ArraySeq.unsafeWrapArray(k), k)))
    val hits: Map[ArraySeq[Byte], Array[Long]] =
      if (uniq.isEmpty) Map.empty
      else {
        val keys = uniq.values.toIndexedSeq
        keys.iterator.zip(index.multiGet(keys).iterator).flatMap {
          case (k, Some(v)) =>
            val s = new String(v, UTF_8)
            // a cap-tombstoned fingerprint is a MISS (overlapping's rule)
            if (s == graft.core.IndexTombstone.Value) None
            else Some(ArraySeq.unsafeWrapArray(k) -> s.split(',').map(_.toLong))
          case _ => None
        }.toMap
      }
    perDoc.iterator.map { fps =>
      fps.iterator
        .flatMap(k => hits.getOrElse(ArraySeq.unsafeWrapArray(k), Array.empty[Long]))
        .toIndexedSeq.distinct.sorted
    }.toIndexedSeq
  }

  def close(): Unit = index.close()
}

object OverlapReader {
  /** The fp-anchor index-type authority string — defined HERE (Spark-free)
    * so the serving reader never loads the Spark-heavy operators package;
    * [[graft.operators.Dedup.SpanIndexType]] aliases it (one definition). */
  val IndexType = "fp-anchor"
}
