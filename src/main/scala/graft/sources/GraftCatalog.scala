package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.DomainSpec
import graft.store.{DomainCatalog, DomainStore}

/**
 * Spark SQL `TableCatalog` over a directory of domains — the reference's
 * database surface (a config mapping database names to domain roots,
 * `getDomains` enumerating them: core.thrift:80-91) re-expressed as
 * Spark's own catalog mechanism, so plain SQL reads a published domain
 * with no DataFrame code at all:
 *
 * {{{
 *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
 *   spark.conf.set("spark.sql.catalog.graft.root", "/data/domains")
 *   spark.sql("SHOW TABLES IN graft")
 *   spark.sql("SELECT key, value, shard FROM graft.`my-domain` WHERE shard = 3")
 * }}}
 *
 * Each table is the newest PUBLISHED version of one kv-sorted domain,
 * served through [[KvDomainV2]] — so SQL queries inherit the full
 * physical story: shard-pruning and key-range pushdown, reported
 * hash-partitioning (storage-partitioned joins between two same-sharded
 * catalog tables plan with zero exchange), and per-shard key order. The
 * version is resolved at `loadTable` time and pinned for the plan —
 * exactly the reference's snapshot semantics; re-resolve (re-run the
 * query) to pick up a newer publish.
 *
 * Read-only by design: domains are built/updated through
 * [[graft.store.DomainStore]]'s versioned write path (bulk build, upsert,
 * reshard), never through SQL DDL — every mutating method fails loud.
 * Parquet/orc-backed domains are Spark-scan engines without a
 * layout-reporting source; loading one names the migration path instead
 * of limping. The namespace is flat (a "database" is one root dir),
 * mirroring [[graft.store.DomainCatalog]].
 */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _
  private var conf: Configuration = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"GraftCatalog '$name' requires spark.sql.catalog.$name.root = <dir of domain roots>"))
    // the session's Hadoop conf at registration time rides to executors
    // through KvDomainV2's registry, same as readPartitioned
    conf = SparkSession.active.sessionState.newHadoopConf()
  }

  override def name(): String = catalogName

  private def domains = new DomainCatalog(root, conf)

  private def requireFlat(namespace: Array[String]): Unit =
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireFlat(namespace)
    domains.listDomains.map(Identifier.of(Array.empty[String], _)).toArray
  }

  /** O(1) existence: two spec-file probes, never a root listing — a SQL
    * table resolution must not pay O(domains-under-root) metadata calls
    * (DomainCatalog.listDomains does; it is the right cost for SHOW
    * TABLES, the wrong one for resolving a single name). */
  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && {
      val dir = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root), ident.name)
      val fs = dir.getFileSystem(conf)
      fs.exists(new org.apache.hadoop.fs.Path(dir, DomainSpec.FileName)) ||
        fs.exists(new org.apache.hadoop.fs.Path(dir, DomainSpec.YamlFileName))
    }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** SQL time travel: `SELECT ... FROM cat.dom VERSION AS OF <v>` reads
    * that PUBLISHED version — the catalog twin of
    * `DomainStore.readPartitioned(spark, v)` (versions are the domain's
    * own ids, the reference's caller-assigned longs). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF '$version': graft domain versions are the store's own " +
          "numeric version ids (see SHOW TABLES + DomainCatalog.toDf for the list)")
    }
    load(ident, Some(v))
  }

  /** `TIMESTAMP AS OF` has no defined meaning here: version ids are
    * caller-assigned longs, not wall-clock instants — refuse loudly
    * rather than guess a mapping. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    throw new UnsupportedOperationException(
      "TIMESTAMP AS OF is not supported: graft domain versions are caller-assigned " +
        "ids, not timestamps — use VERSION AS OF <version id>")

  private def load(ident: Identifier, version: Option[Long]): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException((ident.namespace :+ ident.name).toSeq)
    val store = domains.domain(ident.name)
    require(
      store.spec.persistenceFormat == DomainSpec.KvSorted ||
        store.spec.persistenceFormat == DomainSpec.KvSortedZ,
      s"domain '${ident.name}' uses persistenceFormat '${store.spec.persistenceFormat}' — " +
        "SQL catalog tables are served through the layout-reporting kv source; " +
        "read this domain via DomainStore.read, or re-export it with " +
        "persistenceFormat = kv-sorted (or kv-sorted-z)")
    val v = version.getOrElse(store.latestVersion)
    require(
      store.versions.isPublished(v),
      s"domain '${ident.name}' has no published version $v " +
        s"(published: ${store.versions.getAllVersions.mkString(", ")})")
    val vp = store.versions.versionPath(v).toString
    KvDomainV2.registerConf(vp, DomainStore.serializableConf(conf))
    new KvDomainTable(vp, store.numShards) {
      override def name(): String = s"$catalogName.${ident.name}@v$v"
    }
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"GraftCatalog is read-only ($op): domains are built and updated through " +
        "DomainStore's versioned write path (write/upsert/reshard), not SQL DDL")

  override def createTable(
      ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}
