package graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{DomainSpec, Sessions}
import graft.store.{DomainCatalog, KvDomainReader, SearchLayout}

/**
 * One-call ops status report — the engine's analog of the reference's web
 * dashboard (`elephantdb-server/src/clj/elephantdb/ui/handler.clj:1-111`
 * rendered per-domain status, shard placement, and version state): ONE
 * DataFrame with a row per domain in a catalog root, fusing
 *  - the catalog surface ([[DomainCatalog.toDf]]: status, format,
 *    versions),
 *  - the shard histogram ([[graft.store.DomainStore.shardStats]]
 *    aggregated to totals + skew: max/min shard rows, empty shards), and
 *  - for published search/positional kv index domains, the per-record-
 *    class census ([[graft.operators.Search.indexStats]]) as a compact
 *    `class=n_records:value_bytes` summary string.
 *
 * Costs: metadata only for the catalog + shard halves (footers/trailers +
 * file status, never data pages); index detection is two Spark-free point
 * lookups per kv domain (`m:stats` / `m:positional`); the index census —
 * the one data-reading part — runs only for domains that ARE indexes,
 * and reads the index, not what it indexes.
 *
 * `runMain graft.Status <catalogRoot> [sfDirForSession]` prints the
 * report and writes `target/status.json` (one JSON object per line).
 */
object Status {

  def report(spark: SparkSession, catalogRoot: String, conf: Configuration): DataFrame = {
    import spark.implicits._
    val cat = new DomainCatalog(catalogRoot, conf)
    // Domains are independent metadata work: run them on the driver pool,
    // and fold shard totals in plain Scala off the driver-side stats tier
    // — a catalog of hundreds of small domains starts ZERO Spark jobs
    // here (only a distributed-scale domain, numShards above the
    // two-tier threshold, pays one, and only index domains pay their
    // census). Sequential per-domain Spark aggregates made the ops
    // dashboard itself O(domains) jobs.
    import scala.collection.parallel.CollectionConverters._
    // The per-domain work blocks on FS I/O and fans out AGAIN inside
    // (shardStatsLocal's per-shard .par): run the domain level on a
    // dedicated bounded pool so a large catalog can't starve the global
    // ForkJoinPool (whose workers would block here while the nested
    // per-shard tasks queue behind them on the same pool).
    val domainPool = new java.util.concurrent.ForkJoinPool(
      math.min(8, Runtime.getRuntime.availableProcessors()))
    val parDomains = cat.listDomains.par
    parDomains.tasksupport =
      new scala.collection.parallel.ForkJoinTaskSupport(domainPool)
    val rows = try parDomains.map { name =>
      // one open per domain (DomainStore.open touches the FS): shared by
      // the metadata read, the stats fold, the footprint gauge, and the
      // index census below — metadataAll would open a second store per
      // domain just to discard it (the DomainCatalog.toDf rule)
      val store = cat.domain(name)
      val m = cat.metadata(name, store)
      val servable =
        m.spec.persistenceFormat == DomainSpec.KvSorted ||
          m.spec.persistenceFormat == DomainSpec.KvSortedZ
      val (nRows, nBytes, maxShard, minShard, emptyShards) =
        if (m.latestVersion.isEmpty) (0L, 0L, 0L, 0L, m.spec.numShards.toLong)
        else if (m.spec.numShards <= graft.store.DomainStore.DefaultDistributeAbove) {
          val stats = store.shardStatsLocal()
          (stats.map(_._2).sum,
            stats.map(_._3).sum,
            if (stats.isEmpty) 0L else stats.map(_._2).max,
            if (stats.isEmpty) 0L else stats.map(_._2).min,
            stats.count(_._2 == 0L).toLong)
        } else {
          val agg = store.shardStats(spark)
            .agg(
              coalesce(sum("n_rows"), lit(0L)),
              coalesce(sum("n_bytes"), lit(0L)),
              coalesce(max("n_rows"), lit(0L)),
              coalesce(min("n_rows"), lit(0L)),
              coalesce(sum(when(col("n_rows") === 0, 1L).otherwise(0L)), lit(0L)))
            .head()
          (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3), agg.getLong(4))
        }
      // Spark-free marker probes: is this kv domain a published index?
      val indexType =
        if (!servable || m.latestVersion.isEmpty) None
        else {
          val r = KvDomainReader.open(new org.apache.hadoop.fs.Path(cat.root, m.name).toString, conf)
          try {
            if (r.get(SearchLayout.PosMetaKey.getBytes("UTF-8")).isDefined) Some("positional")
            else if (r.get(SearchLayout.MetaKey.getBytes("UTF-8")).isDefined) Some("bm25")
            else None
          } finally r.close()
        }
      val indexSummary = indexType.map { t =>
        val census = graft.operators.Search.indexStats(spark, store)
          .orderBy("record_class").collect()
        census.map(r =>
          s"${r.getString(0)}=${r.getLong(1)}:${r.getLong(2)}").mkString(",")
      }
      // the retention-valve gauge (DomainCatalog.toDf's column, here in
      // the fused ops report): versions of history the linked head pins.
      // A corrupt _links.json reads -1 (impossible otherwise) instead of
      // killing the report — the status surface must SHOW the sick
      // domain, not die on it (data read paths stay fail-loud).
      val pinnedSpan = m.latestVersion
        .map(v => try store.linkFootprint(v).pinnedSpan(v)
          catch { case _: Exception => -1L })
        .getOrElse(0L)
      (m.name, m.status, m.updating, m.spec.numShards, m.spec.persistenceFormat,
        m.latestVersion, m.versions.size, m.failedVersions.size,
        nRows, nBytes, maxShard, minShard, emptyShards,
        indexType, indexSummary, pinnedSpan)
    }.seq.toSeq
    finally domainPool.shutdown()
    rows.toDF(
      "domain", "status", "updating", "num_shards", "persistence_format",
      "latest_version", "n_versions", "n_failed_versions",
      "n_rows", "n_bytes", "max_shard_rows", "min_shard_rows", "empty_shards",
      "index_type", "index_classes", "linked_pinned_span")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Status <catalogRoot>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = report(spark, args(0), new Configuration())
    df.show(200, truncate = false)
    val json = df.toJSON.collect().mkString("\n")
    val out = java.nio.file.Paths.get("target/status.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
