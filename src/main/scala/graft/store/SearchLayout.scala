package graft.store

/** The search-index domain layout and scoring constants, shared by the
  * Spark build/query side ([[graft.operators.Search]]) and the Spark-free
  * serving side ([[SearchReader]]). Lives in `graft.store` so serving
  * processes depend on zero Spark classes (the [[KvDomainReader]]
  * contract).
  *
  * One domain, four record classes by key prefix:
  *  - `t:<term>`  → postings `"docId:tf,docId:tf,…"` (docId ascending)
  *  - `d:<docId>` → token count of the document
  *  - `x:<term>`  → tombstone for a term DROPPED by the postings cap
  *                  (value = its document frequency) — build-time recall
  *                  accounting that incremental upserts must respect
  *  - `m:stats`   → `"<numDocs>,<totalTokens>"`
  */
object SearchLayout {

  val TermPrefix = "t:"
  val DocPrefix = "d:"
  val DroppedPrefix = "x:"
  val MetaKey = "m:stats"

  /** Positional-index record class (`graft.operators.Search.positionalIndexKv`):
    * `p:<term>` → `"docId:pos;pos;…,docId:pos;…"` (docId ascending,
    * 0-based token positions ascending) — the phrase/proximity sibling of
    * `t:` postings, published as its own domain. */
  val PosPrefix = "p:"

  /** Positional-domain type marker (value `"1"`): its presence is what
    * `positionalIndexUpsert` requires before merging — both index types
    * publish `d:` records, so without a marker an upsert pointed at the
    * WRONG index type would pass the disjointness probe and silently
    * pollute it. */
  val PosMetaKey = "m:positional"

  /** Fixed-point scale for score quantization (2^20). */
  val ScaleBits: Int = 20

  /** The exact-integer BM25 per-term contribution (k1 = 6/5, b = 3/4):
    * `floor(2^20 * (N-df+1) * tf * 22 * T / ((df+1)*(10*tf*T + 3*T + 9*len*N)))`.
    * This BigInt form is the serving kernel; the Spark side computes the
    * same integer with Decimal(38,0) `div` (both exact — pinned
    * bit-identical in SearchSpec). */
  def contrib(nDocs: Long, totalToks: Long, df: Long, tf: Long, len: Long): BigInt =
    (BigInt(1) << ScaleBits) * BigInt(nDocs - df + 1) * BigInt(tf) * 22 * BigInt(totalToks) /
      (BigInt(df + 1) *
        (BigInt(10) * BigInt(tf) * BigInt(totalToks) + BigInt(3) * BigInt(totalToks) +
          BigInt(9) * BigInt(len) * BigInt(nDocs)))

  /** The tokenization unit (lowercased `[a-z0-9]+` runs) as a plain
    * regex — must stay in lockstep with `TextAnalysis.wordTokens`. */
  val TermRegex: scala.util.matching.Regex = "[a-z0-9]+".r

  def terms(query: String): Seq[String] =
    TermRegex.findAllIn(query.toLowerCase).toSeq.distinct

  /** Ordered, duplicates KEPT — the phrase tokenization (offsets matter). */
  def tokens(query: String): Seq[String] =
    TermRegex.findAllIn(query.toLowerCase).toSeq
}
