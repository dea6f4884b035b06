package graft.core

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/**
 * Typed metadata of a domain — the engine's analog of the reference's
 * DomainSpec YAML (numShards / coordinator / shardingScheme /
 * persistenceOptions, reference elephantdb-core DomainSpec.java:28-36).
 * Persisted as `domain-spec.json` in the domain root; the on-disk spec must
 * equal the spec supplied by a writer (reference DomainStore.java:36-54).
 *
 * `shardScheme` / `persistenceFormat` are open strings (the reference uses
 * class-name indirection, DomainSpec.java:46-62); only the listed values are
 * recognized by this engine.
 */
case class DomainSpec(
    numShards: Int,
    shardScheme: String = DomainSpec.HashMod,
    persistenceFormat: String = DomainSpec.ParquetSorted,
    persistenceOptions: Map[String, String] = Map.empty,
    // Write-time index hook (reference Indexer SPI, W5): class name of a
    // graft.store.Indexer, or "none". Class-name indirection like the
    // reference's SPIs; resolution is checked where the store loads it
    // (keeps core free of a store-package dependency).
    indexer: String = DomainSpec.NoIndexer,
    // Index-type authority for published pipeline index domains
    // (lsh-band / phash-band / sem-cell): declared at create time so a
    // probe/upsert type check reads metadata already in hand at open —
    // zero Spark jobs. "none" = not declared; the in-data
    // `m:index-type` marker record remains the fallback authority for
    // domains published before this field existed, and defense in depth
    // everywhere (graft.operators.IndexMarker).
    indexType: String = DomainSpec.NoIndexType,
    // Cap-semantics authority for published membership-index domains:
    // "tombstone-v1" declares that every publish tombstones its
    // cap-dropped buckets (graft.core.IndexTombstone), which is what
    // makes incremental growth safe — upserts gate on it (or on the
    // in-data `m:cap-semantics` marker r14+ builds publish) and fail
    // loud on a legacy publish instead of silently resurrecting
    // buckets the build dropped. "none" = not declared.
    capSemantics: String = DomainSpec.NoCapSemantics) {

  def validate(): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    // scheme-registry seam (reference DomainSpec.java:46-52 loads any
    // shardingScheme class by name): "hash-mod" or a resolvable
    // graft.core.ShardScheme class name — a foreign/typo'd scheme fails
    // HERE, at spec load, never by mis-routing keys.
    ShardScheme.forName(shardScheme)
    require(
      DomainSpec.KnownFormats.contains(persistenceFormat),
      s"unknown persistenceFormat '$persistenceFormat' (known: ${DomainSpec.KnownFormats.mkString(", ")})")
    require(
      indexer != null && indexer.trim.nonEmpty,
      "indexer must be a class name or \"" + DomainSpec.NoIndexer + "\" (got blank)")
    require(
      indexType != null && indexType.trim.nonEmpty,
      "indexType must be an index-type name or \"" + DomainSpec.NoIndexType + "\" (got blank)")
    require(
      DomainSpec.KnownCapSemantics.contains(capSemantics),
      s"unknown capSemantics '$capSemantics' " +
        s"(known: ${DomainSpec.KnownCapSemantics.mkString(", ")})")
  }

  /** The indexer class name, if any. */
  def indexerClass: Option[String] =
    Some(indexer.trim).filter(_ != DomainSpec.NoIndexer)

  /** The declared index type, if any. */
  def indexTypeOption: Option[String] =
    Some(indexType.trim).filter(_ != DomainSpec.NoIndexType)

  /** The declared cap semantics, if any. */
  def capSemanticsOption: Option[String] =
    Some(capSemantics.trim).filter(_ != DomainSpec.NoCapSemantics)

  def toJson: String = DomainSpec.mapper.writeValueAsString(this)
}

object DomainSpec {
  val HashMod = "hash-mod"
  val ParquetSorted = "parquet-sorted"
  val OrcSorted = "orc-sorted"

  /** In-memory test persistence (reference MemoryPersistence, S11):
    * parquet layout on the JVM-local `ramfs://` filesystem — the whole
    * pipeline runs, nothing touches disk. Requires a ramfs:// root. */
  val Memory = "memory"

  /** Servable local-KV format ([[graft.store.KvFile]]): per-shard sorted
    * key/value run + offset index a non-Spark reader binary-searches —
    * the reference's actual serving deliverable (JavaBerkDB.java:60-67,
    * LevelDB.java:46-53 capability class). Spark reads it through the
    * store's parse scan (parallelism = numShards, one sorted run per
    * shard); point gets bypass Spark entirely. This is the SERVING
    * engine — keep parquet-sorted for scan-heavy analytics, where
    * row-group splitting, column pruning, and filter pushdown apply. */
  val KvSorted = "kv-sorted"

  /** Block-compressed servable KV format ([[graft.store.KvzFile]], magic
    * GKZ1): the kv-sorted layout with SSTable-style Deflate blocks — the
    * compressed-engine capability of the reference (LevelDB's Snappy
    * blocks, LevelDB.java:46-53) with the same serving story (readers
    * sniff the magic, so every kv consumer reads both formats). Trades
    * ~2-4x less shard I/O/storage on compressible values for one block
    * decompress per probe — the scan/range-heavy profile; keep plain
    * kv-sorted when point-lookup latency dominates. */
  val KvSortedZ = "kv-sorted-z"
  // scheme names validate through ShardScheme.forName (the registry seam)
  val KnownFormats: Set[String] = Set(ParquetSorted, OrcSorted, Memory, KvSorted, KvSortedZ)

  /** Sentinel for "no write-time index" — a string (not Option) so the
    * persisted JSON stays flat and a spec written before this field
    * existed normalizes cleanly on read. */
  val NoIndexer = "none"

  /** Sentinel for "no declared index type" — same flat-JSON rationale. */
  val NoIndexType = "none"

  /** Sentinel for "no declared cap semantics" — same flat-JSON rationale. */
  val NoCapSemantics = "none"

  /** Cap-dropped buckets keep their key as [[IndexTombstone]] rows —
    * the one cap-semantics version that exists; versioned so a future
    * change to the drop contract is a new value, never a silent
    * reinterpretation of an old publish. */
  val CapTombstoneV1 = "tombstone-v1"

  val KnownCapSemantics: Set[String] = Set(NoCapSemantics, CapTombstoneV1)

  val FileName = "domain-spec.json"

  /** The reference's spec file (DomainSpec.java:20) — read-compat only;
    * this engine always writes [[FileName]]. */
  val YamlFileName = "domain-spec.yaml"

  private[core] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /**
   * Read-side shim for the reference's on-disk spec format, so
   * `DomainStore.open` accepts a reference-layout domain directory
   * (migration path). The reference persists the spec as YAML with keys
   * `coordinator` / `shard_scheme` / `shard_count` / `persistence_opts`
   * (DomainSpec.java:22-25, parseFromMap at DomainSpec.java:137-146); the
   * server example uses the older `num_shards` / `local_persistence`
   * spelling (elephantdb-server/example/domain-spec.yaml:1-2) — both are
   * accepted. Storage engines map to their capability class per SURVEY
   * §2.1: LevelDB -> orc-sorted, JavaBerkDB (and any other coordinator) ->
   * parquet-sorted, the sorted point-lookup default. Only the hash-mod
   * sharding scheme exists on either side (HashModScheme.java:7-11) — a
   * foreign scheme fails loud, since silently re-routing keys would read
   * the wrong shards.
   */
  def fromYaml(yaml: String): DomainSpec = {
    import scala.jdk.CollectionConverters._
    val loaded = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yaml)
    require(loaded != null, "domain-spec.yaml is empty")
    val m = loaded.asScala
    def str(k: String): Option[String] =
      m.get(k).collect { case s: String => s.trim }.filter(_.nonEmpty)
    val numShards = m.get("shard_count").orElse(m.get("num_shards")) match {
      case Some(n: Number) => n.intValue()
      case other => throw new IllegalArgumentException(
        s"domain-spec.yaml: shard_count/num_shards missing or non-numeric (got $other)")
    }
    str("shard_scheme").foreach { s =>
      require(
        s.endsWith(".HashModScheme"),
        s"domain-spec.yaml names shard scheme '$s'; only hash-mod routing exists " +
          "(reference HashModScheme) — opening under a different scheme would probe wrong shards")
    }
    val format = str("coordinator").orElse(str("local_persistence")) match {
      case Some(c) if c.endsWith(".LevelDB") => OrcSorted
      case _ => ParquetSorted
    }
    val opts = m.get("persistence_opts") match {
      case Some(mm: java.util.Map[_, _]) =>
        mm.asScala.map { case (k, v) => String.valueOf(k) -> String.valueOf(v) }.toMap
      case _ => Map.empty[String, String]
    }
    val spec = DomainSpec(numShards, HashMod, format, opts)
    spec.validate()
    spec
  }

  def fromJson(json: String): DomainSpec = {
    val raw = mapper.readValue(json, classOf[DomainSpec])
    // A domain-spec.json written before the indexer/indexType fields
    // existed deserializes with nulls (Jackson skips Scala default args
    // for missing properties) — normalize so spec equality keeps working.
    val spec = raw.copy(
      indexer = if (raw.indexer == null) NoIndexer else raw.indexer,
      indexType = if (raw.indexType == null) NoIndexType else raw.indexType,
      capSemantics = if (raw.capSemantics == null) NoCapSemantics else raw.capSemantics)
    spec.validate()
    spec
  }
}
