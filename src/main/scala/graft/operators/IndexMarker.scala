package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The index-type marker record every published pipeline index carries —
 * the CLAUDE.md rule born from the BM25/positional split: two index
 * types sharing a key scheme need a type authority, or an upsert/probe
 * aimed at the wrong domain silently pollutes (or returns empty). The
 * text band index, the image phash band index, the semantic cell
 * index, and the anchored-fingerprint index all publish binary keys of
 * compatible shapes and comma-joined value cells whose GRAMMAR differs
 * (`id` vs `id:phash`), so `m:index-type` is the only thing separating
 * them: every build publishes it, every probe/upsert verifies it FIRST
 * and fails loud naming both types on a mismatch.
 *
 * Collision-free by construction: band/cell index keys start with a
 * big-endian integer whose first byte is 0x00 (bands < 256, cells <
 * 2^planes), while the marker key starts with 'm' (0x6D); the
 * fingerprint index's raw-md5 keys can start with any byte but are 16
 * bytes long — the 12-byte marker key can never EQUAL one.
 */
private[graft] object IndexMarker {

  val Key: Array[Byte] = "m:index-type".getBytes("UTF-8")

  /** The cap-semantics marker key: a publish that tombstones its
    * cap-dropped buckets ([[graft.core.IndexTombstone]]) records that
    * fact IN the publish, so incremental growth can refuse a legacy
    * (pre-tombstone) publish instead of silently resurrecting buckets
    * its build dropped with no tombstone (the IndexTombstone MIGRATION
    * caveat, made loud). Same collision-free-by-construction argument as
    * [[Key]]: band/cell keys start 0x00, raw-md5 fingerprint keys are 16
    * bytes (this key is 15). */
  val CapKey: Array[Byte] = "m:cap-semantics".getBytes("UTF-8")

  /** The marker as a 1-row (key, value) DataFrame — union it onto the
    * index rows at build time. Incremental paths (upserts, deletes)
    * FILTER it out of their merge inputs (a marker value run through a
    * bucket merge is byte-stable only while it stays comma-free) and
    * let upsert's anti-join carry the published marker forward
    * untouched. */
  def row(spark: SparkSession, indexType: String): DataFrame =
    spark.range(1).select(
      lit(Key).as("key"),
      lit(indexType.getBytes("UTF-8")).as("value"))

  /** The cap-semantics marker as a 1-row frame — the four band-family
    * builders union it onto every publish alongside [[row]]; upserts and
    * deletes filter it from their merge inputs like the type marker. */
  def capRow(spark: SparkSession): DataFrame =
    spark.range(1).select(
      lit(CapKey).as("key"),
      lit(graft.core.DomainSpec.CapTombstoneV1.getBytes("UTF-8")).as("value"))

  /** Verified types, keyed by (root, version, version-token mtime): the
    * marker lookup is a Spark job on parquet-format domains (~0.5 s),
    * and an index's type never changes within one publish — the mtime
    * makes a delete+rebuild at the SAME version id a cache miss, so a
    * stale type can never be served within the filesystem's mtime
    * resolution (a same-version CROSS-TYPE rebuild inside one mtime
    * granule is out of contract — nothing rebuilds an index as a
    * different type at the same version id in one second). Values are
    * the READ type (matching or not), so a wrong-type domain stays loud
    * on every call. Bounded at [[MaxCached]] by OLDEST-ACCESSED eviction
    * ([[graft.core.LruRegistry]], the shared registry): a perpetual
    * streaming updater publishes a new version per micro-batch (each a
    * fresh key, never a hit), so an uncapped map would grow forever —
    * LRU sheds only long-idle publishes, where the wholesale clear this
    * replaced made every 4096th publish pay a burst of re-verification
    * Spark jobs across ALL live domains at once (correctness never
    * depended on a hit either way; this is purely the cost knob). */
  // `final val` (literal) = compile-time constant, immune to the
  // object-body forward-reference default-0 hazard regardless of order
  private final val MaxCached = 4096

  private val verified =
    new graft.core.LruRegistry[(String, Long, Long, String), Option[String]](MaxCached)

  /** One cached point lookup of a reserved marker record — shared by the
    * type gate and the cap-semantics gate (same publish-scoped cache
    * contract as documented on [[verified]]). */
  private def cachedMarker(
      store: graft.store.DomainStore,
      spark: SparkSession,
      markerKey: Array[Byte]): Option[String] = {
    val version = store.latestVersion
    val cacheKey = (store.root.toString, version, store.versions.tokenMtime(version),
      new String(markerKey, "UTF-8"))
    // the lookup is a Spark job on parquet-format domains — compute
    // outside the registry lock (LruRegistry's contract); racing lookups
    // of one publish are idempotent
    verified.getOrElseUpdate(cacheKey)(
      _ => store.get(spark, markerKey).map(new String(_, "UTF-8")))
  }

  /** Verify a published domain IS the expected index type. The
    * AUTHORITY is the `indexType` field of `domain-spec.json` — metadata
    * already in hand at open, so the check costs ZERO Spark jobs. Only a
    * domain whose spec declares no type (published before the field
    * existed) falls back to the in-data marker record — one point lookup,
    * cached per publish. */
  def require(
      store: graft.store.DomainStore,
      spark: SparkSession,
      expected: String,
      op: String,
      buildFn: String): Unit = store.spec.indexTypeOption match {
    case Some(t) if t == expected => ()
    case Some(other) => throw new IllegalArgumentException(
      s"$op: domain at ${store.root} is a '$other' index, not '$expected' " +
        "— this call is aimed at the wrong domain (merging or probing " +
        "across index types silently pollutes or returns empty)")
    case None => requireByMarker(store, spark, expected, op, buildFn)
  }

  /** Spec-only type gate for families whose domains carry no in-data
    * marker (the ANN posting-list domains — their 4-byte cell keys
    * cannot collide with any marker-carrying family, so a wrong aim is
    * a silent no-op rather than pollution, and the spec field is the
    * guard that makes it loud): a DECLARED indexType must be one of
    * `allowed`; an undeclared (pre-field / legacy) spec passes. */
  def requireSpecIn(
      store: graft.store.DomainStore,
      allowed: Set[String],
      op: String): Unit =
    store.spec.indexTypeOption.foreach { t =>
      if (!allowed(t)) throw new IllegalArgumentException(
        s"$op: domain at ${store.root} declares index type '$t', not one of " +
          s"${allowed.mkString("/")} — this call is aimed at the wrong domain")
    }

  /** The tombstone-era gate every band-family UPSERT runs before growing
    * a published index: a publish that predates cap tombstones left NO
    * record for buckets its build dropped, so an incremental merge would
    * re-publish such a bucket with delta-only members — silently
    * diverging from the rebuild it is pinned byte-identical to (the
    * [[graft.core.IndexTombstone]] MIGRATION caveat). The AUTHORITY is
    * the `capSemantics` field of `domain-spec.json` (zero Spark jobs,
    * the indexType precedent); a domain whose spec declares none falls
    * back to the in-data `m:cap-semantics` marker every r14+ build
    * publishes (one point lookup, cached per publish). Absent both, the
    * upsert fails loud naming the rebuild. Probes and deletes need no
    * gate: a legacy publish's missing bucket reads as a miss / no-ops
    * either way — only GROWTH can resurrect. */
  def requireTombstoneCap(
      store: graft.store.DomainStore,
      spark: SparkSession,
      op: String,
      buildFn: String): Unit = {
    val want = graft.core.DomainSpec.CapTombstoneV1
    // the VALUE is the contract version — a future 'tombstone-v2'
    // publish (or a corrupt/foreign marker) must fail this v1 gate
    // loud: silently merging under a different drop contract is the
    // very reinterpretation the version string exists to prevent
    def wrongEra(got: String): Nothing = throw new IllegalArgumentException(
      s"$op: domain at ${store.root} declares cap semantics '$got' but this " +
        s"upsert implements '$want' — merging under a different drop contract " +
        "silently reinterprets what the publish dropped; rebuild with " +
        s"$buildFn (or run the matching engine version)")
    store.spec.capSemanticsOption match {
      case Some(v) if v == want => ()
      case Some(other) => wrongEra(other)
      case None => cachedMarker(store, spark, CapKey) match {
        case Some(v) if v == want => ()
        case Some(other) => wrongEra(other)
        case None => throw new IllegalArgumentException(
          s"$op: domain at ${store.root} was published before cap tombstones " +
            s"existed (no m:cap-semantics marker and no capSemantics in " +
            s"${graft.core.DomainSpec.FileName}) — its build may have dropped " +
            "hot buckets with no tombstone, and incremental growth would " +
            s"silently resurrect them with delta-only members: rebuild with " +
            s"$buildFn first (a legacy build that reported nothing oversized " +
            "may instead declare capSemantics in the spec)")
      }
    }
  }

  private def requireByMarker(
      store: graft.store.DomainStore,
      spark: SparkSession,
      expected: String,
      op: String,
      buildFn: String): Unit = {
    val got = cachedMarker(store, spark, Key)
    got match {
      case Some(t) if t == expected => ()
      case Some(other) => throw new IllegalArgumentException(
        s"$op: domain at ${store.root} is a '$other' index, not '$expected' " +
          "— this call is aimed at the wrong domain (merging or probing " +
          "across index types silently pollutes or returns empty)")
      case None => throw new IllegalArgumentException(
        s"$op: domain at ${store.root} carries no m:index-type marker — " +
          s"not built by $buildFn (or a pre-marker build): re-publish it " +
          s"(or declare indexType in ${graft.core.DomainSpec.FileName})")
    }
  }
}
