package graft.core

/**
 * The cap-tombstone VALUE sentinel shared by the four membership-index
 * families (text `lsh-band`, image `phash-band`, embedding `sem-cell`,
 * fingerprint `fp-anchor`): a bucket whose member count exceeded the
 * publish-time hot-bucket cap keeps its KEY in the index with this value
 * instead of vanishing — the BM25 `x:` stop-term precedent
 * (`Search.invertedIndexKv`) applied to the band families.
 *
 * Why a tombstone and not absence: an absent key is indistinguishable
 * from never-indexed, so an incremental upsert whose delta re-anchors a
 * publish-dropped bucket would merge DELTA-ONLY members and publish a
 * bucket claiming the fingerprint has just those — silently diverging
 * from the rebuild it is pinned byte-identical to (a rebuild counts
 * corpus + delta and drops it again). With the tombstone present:
 *  - probes treat the bucket as a MISS (the documented cap semantics —
 *    corpus-wide boilerplate yields no candidate pairs),
 *  - upserts KEEP it dropped (the key never enters the merge), and a
 *    merge that itself crosses the cap WRITES this value — so
 *    upsert == rebuild stays byte-identical across the cap boundary,
 *  - content-addressed deletes no-op on it (membership is unknown;
 *    rebuild to recount after mass removals).
 *
 * The sentinel can never collide with live values: every family's value
 * grammar is comma-joined entries whose id part is a decimal integer
 * (`id`, `id:phash`, `id:codes`), and '!' is not a digit.
 *
 * MIGRATION: an index published BEFORE tombstones existed has no
 * tombstone for buckets its build dropped (the build would have
 * reported them in `oversizedLshBuckets`) — there a miss is still
 * indistinguishable from never-indexed and incremental growth
 * re-publishes delta-only members for such buckets, exactly the caveat
 * the pre-tombstone docs carried. Re-publish such an index with the
 * family's build function before growing it incrementally; a build
 * that reported nothing oversized never had the hole.
 *
 * Spark-free (the AnchorMath/DomainSpec precedent) so serving-side
 * probes ([[graft.store.OverlapReader]], the Python clients) share the
 * ONE definition.
 */
object IndexTombstone {
  val Value: String = "!capped"
}
