package graft.store

/**
 * The serving surface a ring host exposes — the contract between
 * [[RingClient]]'s routing/failover and whatever answers lookups on the
 * other side. Two implementations:
 *
 *  - [[KvDomainReader]]: in-process, over local shard files (the
 *    embeddable daemon core);
 *  - [[RemoteKvReader]]: a stub speaking [[KvServer]]'s framed binary
 *    protocol to a serving process on another box — the reference served
 *    exactly this surface over framed Thrift
 *    (`elephantdb-thrift/src/core.thrift:80-91`: get/multiGet/getDomains/
 *    update per domain); the protocol here is a dependency-free
 *    re-expression, not a Thrift implementation.
 *
 * Semantics every implementation must keep (RingClient depends on them):
 *  - an ANSWER (present or absent) is authoritative for the routed
 *    shard — only a THROWN failure makes the client fail over;
 *  - `multiGet` results align with the input order; `Some(null)` means
 *    present-with-null-value (the domain schema allows it);
 *  - `refresh()` swaps to the newest published version atomically for
 *    this host; `canRefresh` is false only for bare localized subsets
 *    (no version history), never for broken state — broken state throws.
 */
trait ServingReader extends AutoCloseable {
  def numShards: Int
  /** Version currently served (-1 for a bare localized subset). */
  def servedVersion: Long
  def get(key: Array[Byte]): Option[Array[Byte]]
  def multiGet(keys: Seq[Array[Byte]]): IndexedSeq[Option[Array[Byte]]]
  /** Metadata-only record count of the served version/subset. */
  def count(): Long
  def canRefresh: Boolean
  def refresh(): Boolean

  /** Is the HOST behind this reader fully loaded — every domain it
    * should serve, served at a published version (the reference's
    * `isFullyLoaded` RPC, core.thrift:84)? For an in-process reader the
    * reader IS the serving state and only constructs over a published
    * version (a bare localized subset serves its declared shard set the
    * same way), so the default is true; [[RemoteKvReader]] overrides
    * with a STATUS census round trip — the remote host may be mid-boot
    * with domains still loading. Throws on an unreachable host (the
    * caller decides whether down means "not loaded" or "retry"). */
  def fullyLoaded: Boolean = true

  /** Update every domain on the HOST behind this reader — the
    * reference's `updateAll` RPC (core.thrift:86-87): load domains that
    * published after boot, refresh the rest. Returns (swapped, failed)
    * counts. The in-process default is this reader's own refresh;
    * [[RemoteKvReader]] overrides with the host-wide UPDATE_ALL op. */
  def updateAll(): (Int, Int) =
    if (canRefresh && refresh()) (1, 0) else (0, 0)

  /** One bounded PAGE of an ordered key-range scan (globally key-ordered
    * across the hosted shards, so a caller resumes with
    * `from = lastKey, fromInclusive = false`): the serving twin of
    * [[graft.store.DomainStore.rangeScan]] made REMOTABLE — a framed
    * protocol cannot stream an unbounded cursor, so the page (capped by
    * records AND bytes, whichever lands first) is the transport unit,
    * and [[RemoteKvReader]] stitches pages back into an iterator with
    * cross-page version certification. A truncated page always ends
    * BETWEEN distinct keys (implementations drain a duplicate-key run
    * past the caps, failing loud on a run longer than the page), so the
    * exclusive resume can never drop copies of a repeated key. `shards`
    * restricts the page to those shard indexes — a ring client scans
    * each shard from exactly ONE replica and merges client-side, so a
    * replicated ring is read once, not once per replica; a requested
    * shard this host does not serve throws (the wrong-host loudness of
    * the lookup surface — silently-empty would be indistinguishable
    * from a legitimately empty shard). Engines without ordered storage
    * throw UnsupportedOperationException — loud, like every
    * can't-serve-this condition. */
  def rangePage(
      from: Option[Array[Byte]], fromInclusive: Boolean,
      to: Option[Array[Byte]], toInclusive: Boolean,
      maxRecords: Int, maxBytes: Long,
      shards: Option[Set[Int]] = None): RangePage =
    throw new UnsupportedOperationException(
      s"${getClass.getSimpleName} has no ordered storage to range-scan")

  /** Per-domain metadata — the reference's `getDomainMetaData` RPC
    * (core.thrift:45-54 carries local/remote version, the shard SET and
    * the spec; assembled at common/metadata.clj:16-26): the spec fields,
    * served + latest-published versions, and the shards THIS host
    * carries with their record counts (trailer-tail reads — cheap).
    * What an ops tool or an external router asks before anything else:
    * which shards live here, at what version, in what format. */
  def metadata(): DomainMeta =
    throw new UnsupportedOperationException(
      s"${getClass.getSimpleName} has no metadata surface")

  def close(): Unit
}

/** One page of [[ServingReader.rangePage]]: the version stamps bracket
  * the page read (vLo == vHi certifies ONE serving version answered it,
  * same scheme as the MULTI_GET frames), `truncated` means the range has
  * more records past the last one returned. A null value element is a
  * present-with-null record (the Some(null) of the lookup surface). */
final case class RangePage(
    vLo: Long,
    vHi: Long,
    records: IndexedSeq[(Array[Byte], Array[Byte])],
    truncated: Boolean)

/** [[ServingReader.metadata]]'s answer (reference `DomainMetaData`,
  * core.thrift:45-54): the domain spec's routing-relevant fields, the
  * version pair (served vs latest published — unequal means an update is
  * due; -1 = none), and the shard subset THIS host carries with per-shard
  * record counts (a ring host holds only its ring-assigned shards, so
  * `shards.size < numShards` is the normal replicated-deploy shape). */
final case class DomainMeta(
    numShards: Int,
    servedVersion: Long,
    latestPublished: Long,
    persistenceFormat: String,
    shardScheme: String,
    indexer: String,
    // the spec's index-type AUTHORITY ("none" for plain KV domains) —
    // carried over the wire so non-JVM clients can type-gate published
    // index domains without reading the m:index-type record (which a
    // localized shard subset may not even host)
    indexType: String,
    shards: Seq[DomainMeta.ShardInfo])

object DomainMeta {
  /** One hosted shard: its index and record count. */
  final case class ShardInfo(shard: Int, records: Long)
}
