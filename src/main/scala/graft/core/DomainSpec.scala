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
    indexer: String = DomainSpec.NoIndexer) {

  def validate(): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(
      DomainSpec.KnownSchemes.contains(shardScheme),
      s"unknown shardScheme '$shardScheme' (known: ${DomainSpec.KnownSchemes.mkString(", ")})")
    require(
      DomainSpec.KnownFormats.contains(persistenceFormat),
      s"unknown persistenceFormat '$persistenceFormat' (known: ${DomainSpec.KnownFormats.mkString(", ")})")
    require(
      indexer != null && indexer.trim.nonEmpty,
      "indexer must be a class name or \"" + DomainSpec.NoIndexer + "\" (got blank)")
  }

  /** The indexer class name, if any. */
  def indexerClass: Option[String] =
    Some(indexer.trim).filter(_ != DomainSpec.NoIndexer)

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
  val KnownSchemes: Set[String] = Set(HashMod)
  val KnownFormats: Set[String] = Set(ParquetSorted, OrcSorted, Memory)

  /** Sentinel for "no write-time index" — a string (not Option) so the
    * persisted JSON stays flat and a spec written before this field
    * existed normalizes cleanly on read. */
  val NoIndexer = "none"

  val FileName = "domain-spec.json"

  private[core] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def fromJson(json: String): DomainSpec = {
    val raw = mapper.readValue(json, classOf[DomainSpec])
    // A domain-spec.json written before the indexer field existed
    // deserializes with a null (Jackson skips Scala default args for
    // missing properties) — normalize so spec equality keeps working.
    val spec = if (raw.indexer == null) raw.copy(indexer = NoIndexer) else raw
    spec.validate()
    spec
  }
}
