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
    persistenceOptions: Map[String, String] = Map.empty) {

  def validate(): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(
      DomainSpec.KnownSchemes.contains(shardScheme),
      s"unknown shardScheme '$shardScheme' (known: ${DomainSpec.KnownSchemes.mkString(", ")})")
    require(
      DomainSpec.KnownFormats.contains(persistenceFormat),
      s"unknown persistenceFormat '$persistenceFormat' (known: ${DomainSpec.KnownFormats.mkString(", ")})")
  }

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

  val FileName = "domain-spec.json"

  private[core] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def fromJson(json: String): DomainSpec = {
    val spec = mapper.readValue(json, classOf[DomainSpec])
    spec.validate()
    spec
  }
}
