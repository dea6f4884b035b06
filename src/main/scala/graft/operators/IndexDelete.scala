package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Shared removal engine for published bucket/posting-list indexes — the
 * takedown half of the index lifecycle (publish → probe → upsert →
 * DELETE). Every index family stores `key → comma-joined entry cells`
 * where an entry names a member id (plain `id`, `id:phash`, or
 * `id:codes`); removal is CONTENT-ADDRESSED: the caller re-derives the
 * removed members' bucket keys from their indexed content (text bands,
 * embedding cells, phash bands — the same kernels the build ran), this
 * engine point-looks-up exactly those cells, drops the named ids from
 * each, and publishes ONE new version in which shrunken cells are
 * upserted and now-empty cells are ABSENT ([[graft.store.DomainStore.patch]]).
 * Work is O(removed + affected cells), never O(index); untouched shards
 * copy forward.
 *
 * Removing content that was never indexed is a no-op for those cells,
 * and so is removal from a bucket the publish CAP-TOMBSTONED
 * ([[graft.core.IndexTombstone]] — its membership is unknown, so the
 * tombstone stays; rebuild to recount after mass removals). An id whose
 * indexed CONTENT differs from the content handed here can leave stale
 * entries in buckets this call never probes — the same
 * content-drift caveat every per-cell merge has
 * ([[Similarity.ivfIndexUpsert]]); `Similarity.ivfIndexIdAudit` is the
 * global detector for the ANN families.
 */
private[graft] object IndexDelete {

  /**
   * Publish `newVersion` of `index` with the named members removed.
   * `removals` columns: `key` (binary bucket key), `rids`
   * (array&lt;string&gt; of member ids to drop from that bucket). A stored
   * entry's id is everything before the first ':' ([[entryId]]) — which
   * is the whole entry for the plain-id grammars, so one extractor
   * serves every family (ids are decimal integers, never containing ':').
   */
  def publishRemoval(
      index: graft.store.DomainStore,
      removals: DataFrame,
      newVersion: Long): Unit = {
    val spark = removals.sparkSession
    import graft.functions.{bytes_utf8, utf8_bytes}
    // the removal set feeds the probe and the cell rewrite — materialize
    // once, release before returning (no-cache-leak invariant)
    val r = removals.persist()
    try {
      // hits only: a bucket the index never held has nothing to shrink —
      // and a cap-tombstoned bucket stays tombstoned (no member list to
      // shrink; the checkedId guard below would otherwise read the
      // sentinel as a non-integral member and fail loud)
      val current = index
        .multiGet(r.select(col("key")), includeMisses = false)
        .select(col("key"), bytes_utf8(col("value")).as("cur"))
        .where(col("cur") =!= lit(graft.core.IndexTombstone.Value))
      // cells are sorted at publish and filter() preserves order, so the
      // kept cell stays in the index's canonical byte form. Every stored
      // entry's id part must parse as an integer — a hit whose value is
      // NOT a membership cell (wrong domain wired despite the callers'
      // type gates) fails loud instead of silently keeping everything.
      def checkedId(e: Column): Column =
        when(entryId(e).try_cast("long").isNotNull, entryId(e))
          .otherwise(raise_error(concat(
            lit("indexDelete: stored entry '"), e,
            lit("' has no integral id part — this domain is not a " +
              "membership index (wrong root wired?)"))))
      // array_compact: a null id in rids would make every non-matching
      // array_contains evaluate NULL -> filter drops the whole cell — a
      // silent full-bucket delete. Current callers derive rids null-free
      // (removalsFromBuild), this guards future direct callers.
      // PROJECTED before the filter (a bound reference per row), never
      // inside the lambda — HOF lambdas evaluate interpreted PER
      // ELEMENT, which would recompute the compaction |cell| times.
      val after = r.join(current, Seq("key"))
        .select(col("key"), array_compact(col("rids")).as("_rids"), col("cur"))
        .select(
          col("key"),
          filter(split(col("cur"), ","),
            e => !array_contains(col("_rids"), checkedId(e))).as("kept"))
        .localCheckpoint(true) // feeds both patch sides; ContextCleaner-reaped
      val ups = after.where(size(col("kept")) > 0)
        .select(col("key"), utf8_bytes(concat_ws(",", col("kept"))).as("value"))
      val dels = after.where(size(col("kept")) === 0).select(col("key"))
      // one publish: shrunken cells upserted, emptied cells absent — two
      // separate publishes would expose an intermediate version holding
      // empty cells and double the copy-forward. ups/dels partition ONE
      // checkpointed frame by size(kept), so the clash check is skipped
      // (disjoint by construction — no need to pay its Spark job here).
      index.patch(spark, Some(ups), Some(dels), newVersion, checkDisjoint = false)
    } finally r.unpersist()
  }

  /** The id part of a stored entry: everything before the first ':'
    * (`id:phash` / `id:codes`), or the whole entry (plain-id grammars). */
  private def entryId(e: Column): Column = substring_index(e, ":", 1)

  /** Removal rows derived from a family's own BUILD output on the
    * removed content — (key, rids) with the build's exact key kernel —
    * minus the TWO non-membership row classes builders append: the
    * `m:index-type` marker (left in, its value would read as a member id
    * and the marker key would be deleted as an emptied bucket) and
    * [[graft.core.IndexTombstone]] rows (a default-cap build of a
    * boilerplate-heavy removal set tombstones its hot buckets — left in,
    * `rids = ["!capped"]` matches no stored id, so the removed members
    * would silently SURVIVE the takedown; the in-repo delete wrappers
    * dodge both by building at `maxBucket = Int.MaxValue`, this guards
    * direct callers following the documented pattern). */
  def removalsFromBuild(built: DataFrame): DataFrame = {
    import graft.functions.bytes_utf8
    built
      .where(col("key") =!= lit(IndexMarker.Key))
      .where(bytes_utf8(col("value")) =!= lit(graft.core.IndexTombstone.Value))
      .select(
        col("key"),
        transform(split(bytes_utf8(col("value")), ","), entryId(_)).as("rids"))
  }

  /** The integral-id contract every index family's ids share (they
    * round-trip through value cells as decimal strings). */
  def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$op: id column '$idCol' must be integral " +
          s"(ids travel through index values as decimal strings), got ${other.simpleString}")
    }
  }
}
