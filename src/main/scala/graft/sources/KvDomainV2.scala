package graft.sources

import java.util.OptionalLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportOrdering, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.{KvFile, ShardReader}

/**
 * DataSourceV2 reader over a `kv-sorted` domain version that REPORTS its
 * physical layout to Catalyst — the co-located-join seam of the engine.
 *
 * A published domain is already hash-partitioned by `shard_index(key)`
 * and sorted by key within each shard (the write path's one shuffle).
 * The flatMap-based [[graft.store.DomainStore!.read]] scan hides that
 * from the optimizer, so joining two domains sharded by the SAME scheme
 * re-shuffles both sides — at 100 TB, re-exchanging data that is already
 * co-partitioned on disk is the single largest avoidable cost of a
 * domain-to-domain join (today's corpus index vs yesterday's, corpus vs
 * its per-key stats, delta vs base). This source closes that gap with
 * Spark's own mechanism, storage-partitioned join (SPJ, SPARK-37375):
 *
 *  - each shard is ONE [[InputPartition]] carrying its shard id as a
 *    [[HasPartitionKey]] partition value;
 *  - the scan reports `KeyGroupedPartitioning(identity(shard))`, so an
 *    equi-join of two same-sharded domains on `(shard, key)` plans with
 *    NO exchange on either side (`spark.sql.sources.v2.bucketing.enabled`,
 *    set in [[graft.core.Sessions]]);
 *  - the scan reports per-partition ordering `(shard, key)` — shard is
 *    constant within a partition and the kv run is key-sorted by
 *    construction — so the merge join needs NO sort either
 *    (`spark.sql.sources.v2.bucketing.sorting.enabled`): the join streams
 *    straight off the files.
 *
 * Equal keys imply equal shards (`shard = md5(key) mod n`,
 * [[graft.core.ShardIndex]]), so conditioning the join on
 * `(shard, key)` instead of bare `key` loses nothing and is what lets
 * the partitioning carry the join. Column pruning reaches the format's
 * own reader: a scan that never touches `value` rides
 * [[KvFile.Reader.keysIterator]], skipping value bytes via the record
 * headers. Shard-equality filters prune input partitions the same way
 * the parquet path prunes `shard=` directories.
 *
 * Hadoop conf travels by a driver-side registry keyed by version dir
 * (DSv2 option maps lower-case their keys, so conf entries cannot ride
 * the options); the reader FACTORY captures the entries at plan time and
 * ships them to executors by ordinary closure serialization, same
 * rebuild-per-task pattern as every other distributed tier.
 */
object KvDomainV2 {

  /** Scan output schema — identical to [[graft.store.DomainStore]]'s
    * datasource scans: (key, value, shard). */
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = true),
    StructField("shard", IntegerType, nullable = false)))

  // Driver-side conf hand-off (see class doc). Keyed by version dir;
  // idempotent re-registration. Bounded like the links registry below —
  // a perpetual linked streaming reader registers one (heavier)
  // conf-entry Seq per micro-batch version — by OLDEST-ACCESSED
  // eviction ([[graft.core.LruRegistry]]): reader factories capture entries at
  // PLAN time (executors never consult the registry), so eviction only
  // affects not-yet-planned frames, and LRU order keeps the freshly
  // registered (about-to-plan) entries while shedding long-idle
  // versions. A post-eviction linkedDirsFor miss for an old version
  // falls back to the default-conf manifest read — identical to a
  // direct (never registered) spark.read of that version: exotic-FS
  // confs fail LOUD there, never silently.
  // `final val` (literal, untyped) = a compile-time constant inlined at
  // use sites, so declaration order can never matter: a plain val here
  // once read as its uninitialized DEFAULT (0) through an object-body
  // forward reference — a cap-0 registry silently evicts every entry
  private final val MaxCachedVersionDirs = 4096

  private val confs =
    new graft.core.LruRegistry[String, Seq[(String, String)]](MaxCachedVersionDirs)

  def registerConf(versionDir: String, entries: Seq[(String, String)]): Unit =
    confs.put(versionDir, entries)

  private[sources] def confFor(versionDir: String): Seq[(String, String)] =
    confs.get(versionDir).getOrElse(Seq.empty)

  // Link-aware shard-dir overrides (manifest-linked publishes: an
  // untouched shard's dir lives in an OLDER version dir). Registered by
  // DomainStore.readPartitioned beside the conf; resolved at PLANNING on
  // the driver and shipped to executors inside the input partitions, so
  // the executor side never reads `_links.json`. A registry MISS is NOT
  // "no links": a direct `spark.read.format(KvDomainTableProvider)` of a
  // linked version (notebook, saved pipeline, fresh JVM) never went
  // through readPartitioned, and assuming no links would make its linked
  // shards read as legitimately empty — the silent 'key absent' class.
  // On a miss the manifest is read HERE (driver, once, memoized into the
  // registry; a registered EMPTY map is a positive "no links" answer).
  // Bounded: a perpetual linked streaming reader accretes one entry per
  // version dir, so past MaxCachedVersionDirs the OLDEST-accessed
  // entries evict ([[graft.core.LruRegistry]]) — a later miss just re-reads the
  // manifest.
  // Entries carry the version TOKEN's mtime as a freshness stamp (the
  // VersionedStore.tokenMtime discipline): the registry is JVM-GLOBAL,
  // so an in-contract same-id delete+rebuild — which re-creates the
  // token — must not keep serving the OLD build's memoized link map to
  // catalog/direct readers (silent stale reads from still-retained
  // origin dirs; FileNotFoundException once GC reaps them). One token
  // stat per linkedDirsFor call; the planning loops call it once per
  // scan, never per shard.
  private val links =
    new graft.core.LruRegistry[String, (Long, Map[Int, String])](MaxCachedVersionDirs)

  private def tokenStamp(vd: Path, fs: org.apache.hadoop.fs.FileSystem): Long =
    try fs.getFileStatus(new Path(vd.getParent, vd.getName + ".version"))
      .getModificationTime
    catch { case _: java.io.FileNotFoundException => -1L } // no token (building/legacy)

  def registerLinks(versionDir: String, shardDirs: Map[Int, String]): Unit = {
    val vd = new Path(versionDir)
    links.put(versionDir,
      (tokenStamp(vd, vd.getFileSystem(rebuild(confFor(versionDir)))), shardDirs))
  }

  private[sources] def linkedDirsFor(versionDir: String): Map[Int, String] = {
    val vd = new Path(versionDir)
    val fs = vd.getFileSystem(rebuild(confFor(versionDir)))
    val stamp = tokenStamp(vd, fs)
    links.get(versionDir) match {
      case Some((cached, m)) if cached == stamp => m
      case _ =>
        val resolved = graft.store.VersionedStore.readLinks(fs, vd).map {
          case (sh, origin) =>
            sh -> new Path(new Path(vd.getParent, origin.toString), s"shard=$sh").toString
        }
        links.put(versionDir, (stamp, resolved))
        resolved
    }
  }


  /** The kv data-file suffix — ONE definition, derived from the format's
    * canonical file name so it cannot drift from [[KvFile]]. */
  private[sources] val Suffix: String =
    KvFile.DataFileName.substring(KvFile.DataFileName.lastIndexOf('.'))

  /** Rebuild a Hadoop conf from shipped entries (the DomainStore idiom);
    * empty entries fall back to a default-loaded Configuration. */
  private[sources] def rebuild(entries: Seq[(String, String)]): Configuration =
    if (entries.isEmpty) new Configuration()
    else {
      val c = new Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }

  /** A pushed-down key range (unsigned-lexicographic bounds, `None` =
    * open end). The scan hands it to [[KvFile.Reader.range]] per shard
    * file: I/O proportional to the range, not the shard — capability the
    * parquet path cannot offer (Spark does not push BinaryType
    * comparisons into parquet, and binary min/max row-group stats are
    * unused), so key-range queries are a kv-engine specialty. Bounds are
    * I/O pruning ONLY — every filter is also returned residual, Spark
    * still evaluates it per row. */
  case class KeyRange(
      from: Option[Array[Byte]] = None,
      fromInclusive: Boolean = true,
      to: Option[Array[Byte]] = None,
      toInclusive: Boolean = true) {
    def isUnbounded: Boolean = from.isEmpty && to.isEmpty
    def withLower(b: Array[Byte], inc: Boolean): KeyRange = from match {
      case None => copy(from = Some(b), fromInclusive = inc)
      case Some(cur) =>
        val cmp = java.util.Arrays.compareUnsigned(b, cur)
        if (cmp > 0) copy(from = Some(b), fromInclusive = inc)
        else if (cmp < 0) this
        else copy(fromInclusive = fromInclusive && inc)
    }
    def withUpper(b: Array[Byte], inc: Boolean): KeyRange = to match {
      case None => copy(to = Some(b), toInclusive = inc)
      case Some(cur) =>
        val cmp = java.util.Arrays.compareUnsigned(b, cur)
        if (cmp < 0) copy(to = Some(b), toInclusive = inc)
        else if (cmp > 0) this
        else copy(toInclusive = toInclusive && inc)
    }
    override def toString: String = {
      def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
      val lo = from.fold("(-inf")(b => (if (fromInclusive) "[" else "(") + hex(b))
      val hi = to.fold("+inf)")(b => hex(b) + (if (toInclusive) "]" else ")"))
      s"$lo..$hi"
    }
  }
}

/** Entry point Spark instantiates from the format class name. */
class KvDomainTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KvDomainV2.Schema
  override def supportsExternalMetadata(): Boolean = false
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("kv domain source requires option 'path' (version dir)"))
    val shards = Option(properties.get("shards")).getOrElse(
      throw new IllegalArgumentException("kv domain source requires option 'shards'")).toInt
    new KvDomainTable(path, shards)
  }
}

class KvDomainTable(versionDir: String, numShards: Int) extends Table with SupportsRead {
  override def name(): String = s"kvdomain($versionDir, shards=$numShards)"
  override def schema(): StructType = KvDomainV2.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvDomainScanBuilder(versionDir, numShards)
}

class KvDomainScanBuilder(versionDir: String, numShards: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private var required: StructType = KvDomainV2.Schema
  private var keepShards: Option[Set[Int]] = None
  private var keyRange: KvDomainV2.KeyRange = KvDomainV2.KeyRange()
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var agg: Option[(Boolean, Seq[KvAggFunc])] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands back a subset of Schema's fields (possibly empty,
    // for count-only scans); honor its order.
    required = requiredSchema

  /** Shard-equality predicates prune input partitions (the DSv2 twin of
    * the parquet path's `PartitionFilters: shard IN (...)`), and key
    * comparisons narrow a [[KvDomainV2.KeyRange]] each shard reader
    * resolves by binary search + bounded sequential read — range I/O
    * proportional to the selected keys, not the domain. Every filter is
    * returned as residual: the engine prunes WHICH bytes are read, Spark
    * still evaluates the predicate per row — exactly the partition-
    * pruning contract, with no semantic risk on the source. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def shardSet(f: Filter): Option[Set[Int]] = f match {
      case EqualTo("shard", v: Int) => Some(Set(v))
      case EqualNullSafe("shard", v: Int) => Some(Set(v))
      case In("shard", vs) if vs.forall(_.isInstanceOf[Int]) =>
        Some(vs.map(_.asInstanceOf[Int]).toSet)
      case _ => None
    }
    def keyBound(f: Filter): Boolean = f match {
      case GreaterThan("key", v: Array[Byte]) =>
        keyRange = keyRange.withLower(v, inc = false); true
      case GreaterThanOrEqual("key", v: Array[Byte]) =>
        keyRange = keyRange.withLower(v, inc = true); true
      case LessThan("key", v: Array[Byte]) =>
        keyRange = keyRange.withUpper(v, inc = false); true
      case LessThanOrEqual("key", v: Array[Byte]) =>
        keyRange = keyRange.withUpper(v, inc = true); true
      case EqualTo("key", v: Array[Byte]) =>
        keyRange = keyRange.withLower(v, inc = true).withUpper(v, inc = true); true
      case _ => false
    }
    val shardFilters = filters.flatMap(f => shardSet(f).map(f -> _))
    shardFilters.foreach { case (_, s) =>
      keepShards = Some(keepShards.fold(s)(_ intersect s))
    }
    val keyFilters = filters.filter(keyBound)
    pushed = shardFilters.map(_._1) ++ keyFilters
    filters // all residual: pruning is an optimization, not an evaluation
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT pushdown: each input partition (= one shard) stops after
    * `limit` records — the global limit needs at most `limit` rows from
    * any shard. Partial by declaration: Spark still applies the final
    * limit; the engine just stops reading bytes early. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

  /** TopN pushdown for `ORDER BY key [shard, key] ASC LIMIT n`: the kv
    * run is key-sorted per shard, so the first n records of each shard
    * are a superset of the global top-n — the same per-partition stop,
    * declared partial (Spark's TakeOrdered still merges). Descending
    * orders are refused (the format has no reverse iterator). */
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    def name(o: SortOrder): Option[String] = o.expression match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }
    val names = orders.toSeq.map(name)
    val ok = orders.forall(_.direction == SortDirection.ASCENDING) &&
      (names == Seq(Some("key")) || names == Seq(Some("shard"), Some("key")))
    if (ok) limit = Some(l)
    ok
  }

  /** Aggregate pushdown from the kv trailers: COUNT(*) / COUNT(key) read
    * the per-shard record counts (one trailer pread each), MIN/MAX(key)
    * read the first/last record key of each shard (the run is sorted) —
    * a whole-domain count/extent costs O(shards) positioned reads and
    * ZERO data bytes, the DSv2 face of `DomainStore.getCount`
    * (elephantdb's getDomainCount, core.thrift:21). Complete pushdown,
    * accepted only on an unfiltered, unlimited scan (every row of every
    * shard participates — residual filters would otherwise be lost);
    * optional GROUP BY shard emits one row per non-empty shard dir,
    * which is exact because shard dirs partition the domain. */
  private def translate(a: Aggregation): Option[(Boolean, Seq[KvAggFunc])] = {
    def col(e: V2Expression): Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames()(0))
      case _ => None
    }
    val byShard: Option[Boolean] = a.groupByExpressions() match {
      case Array() => Some(false)
      case Array(e) if col(e).contains("shard") => Some(true)
      case _ => None
    }
    val funcs: Seq[Option[KvAggFunc]] = a.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(KvAggFunc.CountAll)
      case c: Count if !c.isDistinct && col(c.column).contains("key") =>
        Some(KvAggFunc.CountAll) // key is non-null: count(key) == count(*)
      case m: Min if col(m.column).contains("key") => Some(KvAggFunc.MinKey)
      case m: Max if col(m.column).contains("key") => Some(KvAggFunc.MaxKey)
      case _ => None
    }
    for {
      g <- byShard
      fs <- if (funcs.nonEmpty && funcs.forall(_.isDefined)) Some(funcs.flatten)
            else None
    } yield (g, fs)
  }

  private def aggEligible: Boolean =
    pushed.isEmpty && keepShards.isEmpty && keyRange.isUnbounded && limit.isEmpty

  override def supportCompletePushDown(a: Aggregation): Boolean =
    aggEligible && translate(a).isDefined

  override def pushAggregation(a: Aggregation): Boolean =
    if (!aggEligible) false
    else translate(a) match {
      case Some(t) => agg = Some(t); true
      case None => false
    }

  override def build(): Scan = agg match {
    case Some((byShard, funcs)) =>
      new KvDomainAggScan(versionDir, numShards, byShard, funcs)
    case None =>
      new KvDomainScan(versionDir, numShards, required, keepShards, keyRange, limit)
  }
}

/** Trailer-computable aggregate functions (see pushAggregation). */
sealed trait KvAggFunc extends Serializable
object KvAggFunc {
  case object CountAll extends KvAggFunc
  case object MinKey extends KvAggFunc
  case object MaxKey extends KvAggFunc
}

/** The pushed-aggregate scan: ONE input partition whose reader folds the
  * shard trailers (and first/last keys) into final rows — row counts and
  * key extents without touching a single data byte. */
class KvDomainAggScan(
    versionDir: String,
    numShards: Int,
    byShard: Boolean,
    funcs: Seq[KvAggFunc]) extends Scan with Batch {

  private def aggField(f: KvAggFunc, i: Int): StructField = f match {
    case KvAggFunc.CountAll => StructField(s"count_$i", LongType, nullable = false)
    case KvAggFunc.MinKey => StructField(s"min_$i", BinaryType, nullable = true)
    case KvAggFunc.MaxKey => StructField(s"max_$i", BinaryType, nullable = true)
  }

  override def readSchema(): StructType = {
    val g = if (byShard) Seq(StructField("shard", IntegerType, nullable = false)) else Seq.empty
    StructType(g ++ funcs.zipWithIndex.map { case (f, i) => aggField(f, i) })
  }

  override def toBatch: Batch = this
  override def description(): String =
    s"kvdomain-agg $versionDir funcs=[${funcs.mkString(",")}]" +
      (if (byShard) " groupBy=shard" else "")

  override def planInputPartitions(): Array[InputPartition] =
    // linked shard dirs resolve at planning (driver registry) and ride
    // the partition to the executor
    Array(KvAggInputPartition(versionDir, numShards, KvDomainV2.linkedDirsFor(versionDir)))

  override def createReaderFactory(): PartitionReaderFactory =
    KvAggReaderFactory(KvDomainV2.confFor(versionDir), byShard, funcs)
}

case class KvAggInputPartition(
    versionDir: String,
    numShards: Int,
    linkedDirs: Map[Int, String]) extends InputPartition

case class KvAggReaderFactory(
    confEntries: Seq[(String, String)],
    byShard: Boolean,
    funcs: Seq[KvAggFunc]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvAggInputPartition]
    new KvAggPartitionReader(p.versionDir, p.numShards, p.linkedDirs, confEntries, byShard, funcs)
  }
}

/** Computes the pushed aggregates from trailers + first/last record keys.
  * Per shard file: one trailer pread for the count, two more positioned
  * reads each for min/max when requested. Empty shard dirs contribute no
  * group row (GROUP BY) and zeros/nulls (global). */
class KvAggPartitionReader(
    versionDir: String,
    numShards: Int,
    linkedDirs: Map[Int, String],
    confEntries: Seq[(String, String)],
    byShard: Boolean,
    funcs: Seq[KvAggFunc]) extends PartitionReader[InternalRow] {

  private case class ShardAgg(shard: Int, count: Long, min: Array[Byte], max: Array[Byte])

  private val rows: Iterator[InternalRow] = {
    val conf = KvDomainV2.rebuild(confEntries)
    val needKeys = funcs.exists(f => f != KvAggFunc.CountAll)
    val perShard: Seq[ShardAgg] = (0 until numShards).flatMap { s =>
      val d = new Path(linkedDirs.getOrElse(s, s"$versionDir/shard=$s"))
      val fs = d.getFileSystem(conf)
      if (!fs.exists(d)) None
      else {
        val files = fs.listStatus(d).toSeq
          .filter(_.getPath.getName.endsWith(KvDomainV2.Suffix))
          .map(_.getPath)
        var count = 0L
        var min: Array[Byte] = null
        var max: Array[Byte] = null
        files.foreach { p =>
          if (!needKeys) count += KvFile.count(fs, p)
          else {
            val r = KvFile.open(fs, p)
            try {
              val n = r.count
              count += n
              if (n > 0) {
                val lo = r.keyAt(0)
                val hi = r.keyAt(n - 1)
                if (min == null || KvShardPartitionReader.UnsignedBytes.lt(lo, min)) min = lo
                if (max == null || KvShardPartitionReader.UnsignedBytes.gt(hi, max)) max = hi
              }
            } finally r.close()
          }
        }
        if (count == 0) None else Some(ShardAgg(s, count, min, max))
      }
    }
    def cells(a: ShardAgg): Seq[Any] = funcs.map {
      case KvAggFunc.CountAll => a.count
      case KvAggFunc.MinKey => a.min
      case KvAggFunc.MaxKey => a.max
    }
    if (byShard)
      perShard.iterator.map(a => new GenericInternalRow((a.shard +: cells(a)).toArray))
    else {
      val total = perShard.foldLeft(ShardAgg(-1, 0L, null, null)) { (acc, a) =>
        ShardAgg(-1, acc.count + a.count,
          if (acc.min == null || (a.min != null && KvShardPartitionReader.UnsignedBytes.lt(a.min, acc.min))) a.min else acc.min,
          if (acc.max == null || (a.max != null && KvShardPartitionReader.UnsignedBytes.gt(a.max, acc.max))) a.max else acc.max)
      }
      Iterator.single(new GenericInternalRow(cells(total).toArray))
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (!rows.hasNext) false
    else { current = rows.next(); true }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

class KvDomainScan(
    versionDir: String,
    numShards: Int,
    required: StructType,
    keepShards: Option[Set[Int]],
    keyRange: KvDomainV2.KeyRange = KvDomainV2.KeyRange(),
    limit: Option[Int] = None)
    extends Scan
    with Batch
    with SupportsReportPartitioning
    with SupportsReportOrdering
    with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  // Runtime (DPP-style) shard pruning: when a join's other side is small
  // and selective, Spark's PartitionPruning rule hands this scan the
  // runtime `shard IN (...)` filter derived from the build side — the
  // DSv2 twin of dynamic partition pruning, and the automatic version of
  // lookupJoin's plan-time shard derivation: ANY join conditioned on
  // `shard` prunes which shard files are opened, no engine API needed.
  // Declared pruning (keepShards) and runtime pruning intersect.
  @volatile private var runtimeShards: Option[Set[Int]] = None

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column("shard"))

  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    def shardSet(f: org.apache.spark.sql.sources.Filter): Option[Set[Int]] = f match {
      case EqualTo("shard", v: Int) => Some(Set(v))
      case EqualNullSafe("shard", v: Int) => Some(Set(v))
      case In("shard", vs) if vs.forall(_.isInstanceOf[Int]) =>
        Some(vs.map(_.asInstanceOf[Int]).toSet)
      case _ => None
    }
    val sets = filters.flatMap(shardSet)
    if (sets.nonEmpty) runtimeShards = Some(sets.reduce(_ intersect _))
  }

  private def shards: Seq[Int] =
    (0 until numShards).filter(s =>
      keepShards.forall(_.contains(s)) && runtimeShards.forall(_.contains(s)))
  private def has(name: String): Boolean = required.fieldNames.contains(name)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"kvdomain $versionDir shards=${shards.size}/$numShards cols=[${required.fieldNames.mkString(",")}]" +
      (if (keyRange.isUnbounded) "" else s" keyRange=$keyRange") +
      limit.fold("")(l => s" limit=$l")

  override def planInputPartitions(): Array[InputPartition] = {
    // resolve links ONCE per plan (one token stat + one registry probe),
    // not once per shard
    val dirs = KvDomainV2.linkedDirsFor(versionDir)
    shards.map(s =>
      KvShardInputPartition(s, dirs.getOrElse(s, s"$versionDir/shard=$s"))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KvDomainReaderFactory(
      KvDomainV2.confFor(versionDir), required.fieldNames.toSeq, keyRange, limit)

  /** One partition per shard, keyed by the identity transform over the
    * `shard` output column — only claimable when `shard` survives column
    * pruning (the partitioning must resolve against the scan output). */
  override def outputPartitioning(): Partitioning =
    if (has("shard"))
      new KeyGroupedPartitioning(Array(Expressions.identity("shard")), shards.size)
    else new UnknownPartitioning(shards.size)

  /** Per-partition order: shard is constant within a partition and the kv
    * run is key-sorted, so any claim prefixed by `shard` holds. */
  override def outputOrdering(): Array[SortOrder] = {
    val shardOrd =
      if (has("shard")) Seq(Expressions.sort(Expressions.column("shard"), SortDirection.ASCENDING))
      else Seq.empty
    val keyOrd =
      if (has("key")) Seq(Expressions.sort(Expressions.column("key"), SortDirection.ASCENDING))
      else Seq.empty
    (shardOrd ++ keyOrd).toArray
  }

  /** Row-count statistics from the kv trailers (one positioned read per
    * shard file, driver-side, cached for the scan's lifetime) — lets the
    * planner see a small domain is broadcast-able. Computed ONLY for
    * small shard counts: the listing+trailer pass is O(shards) driver
    * I/O at plan time, and a domain big enough to carry
    * [[KvDomainScan.StatsMaxShards]]+ shards is never broadcastable —
    * unknown statistics make the planner assume big, which is then
    * correct. */
  override def estimateStatistics(): Statistics =
    if (shards.size > KvDomainScan.StatsMaxShards) new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.empty()
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
    else new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(totalBytes)
      override def numRows(): OptionalLong = OptionalLong.of(totalRows)
    }

  private lazy val (totalBytes, totalRows): (Long, Long) = {
    val conf = KvDomainV2.rebuild(KvDomainV2.confFor(versionDir))
    val dirs = KvDomainV2.linkedDirsFor(versionDir)
    var bytes = 0L
    var rows = 0L
    shards.foreach { s =>
      val d = new Path(dirs.getOrElse(s, s"$versionDir/shard=$s"))
      val fs = d.getFileSystem(conf)
      if (fs.exists(d)) fs.listStatus(d).foreach { st =>
        if (st.getPath.getName.endsWith(KvDomainV2.Suffix)) {
          bytes += st.getLen
          rows += KvFile.count(fs, st.getPath)
        }
      }
    }
    (bytes, rows)
  }
}

object KvDomainScan {
  /** Shard-count ceiling for plan-time statistics (see
    * [[KvDomainScan.estimateStatistics]]). 256 shards x one listing +
    * one trailer pread is comfortably sub-second on any store; beyond
    * it the domain is past broadcast size by construction. */
  val StatsMaxShards = 256
}

case class KvShardInputPartition(shard: Int, shardDir: String)
    extends InputPartition
    with HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(Array[Any](shard))
}

case class KvDomainReaderFactory(
    confEntries: Seq[(String, String)],
    fields: Seq[String],
    keyRange: KvDomainV2.KeyRange = KvDomainV2.KeyRange(),
    limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvShardInputPartition]
    new KvShardPartitionReader(p.shard, p.shardDir, confEntries, fields, keyRange, limit)
  }
}

/**
 * Streams one shard's records as [[InternalRow]]s in the pruned column
 * order. Multiple files in a shard dir (never produced by the current
 * write path, which routes each shard to exactly one task — but legal on
 * disk) are MERGED by unsigned key order so the reported ordering holds
 * unconditionally. A scan that excludes `value` rides the keys-only
 * iterator: value bytes are skipped via the record headers, never read.
 */
class KvShardPartitionReader(
    shard: Int,
    shardDir: String,
    confEntries: Seq[(String, String)],
    fields: Seq[String],
    keyRange: KvDomainV2.KeyRange = KvDomainV2.KeyRange(),
    limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {

  private val needValue = fields.contains("value")

  private val conf: Configuration = KvDomainV2.rebuild(confEntries)

  private var readers: Seq[ShardReader] = Seq.empty

  private val rows: Iterator[(Array[Byte], Array[Byte])] = {
    val d = new Path(shardDir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) Iterator.empty
    else {
      val files = fs.listStatus(d).toSeq
        .filter(_.getPath.getName.endsWith(KvDomainV2.Suffix))
        .sortBy(_.getPath.getName)
      readers = files.map(st => KvFile.open(fs, st.getPath))
      val streams: Seq[Iterator[(Array[Byte], Array[Byte])]] =
        if (!keyRange.isUnbounded)
          // pushed key range: binary-search start + bounded sequential
          // body per file — I/O proportional to the range, not the shard
          readers.map(_.range(
            keyRange.from, keyRange.fromInclusive,
            keyRange.to, keyRange.toInclusive,
            withValues = needValue))
        else if (needValue) readers.map(_.iterator)
        else readers.map(_.keysIterator.map(k => (k, null: Array[Byte])))
      val merged = streams match {
        case Seq() => Iterator.empty
        case Seq(one) => one
        case many => KvShardPartitionReader.mergeSorted(many)
      }
      // pushed (partial) LIMIT/TopN: stop after `limit` records — the
      // run is key-sorted, so these are exactly the shard's smallest keys
      limit.fold(merged)(merged.take)
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (!rows.hasNext) false
    else {
      val (k, v) = rows.next()
      val vals = fields.map {
        case "key" => k
        case "value" => v
        case "shard" => shard
        case f => throw new IllegalStateException(s"unknown kv domain column '$f'")
      }
      current = new GenericInternalRow(vals.toArray[Any])
      true
    }

  override def get(): InternalRow = current

  override def close(): Unit = {
    readers.foreach(r => try r.close() catch { case _: Exception => () })
    readers = Seq.empty
  }
}

object KvShardPartitionReader {
  /** K-way merge of key-sorted streams by unsigned key order (k is the
    * file count of one shard dir — 1 in practice). */
  def mergeSorted(
      streams: Seq[Iterator[(Array[Byte], Array[Byte])]]): Iterator[(Array[Byte], Array[Byte])] = {
    val heads = streams.map(_.buffered)
    new Iterator[(Array[Byte], Array[Byte])] {
      override def hasNext: Boolean = heads.exists(_.hasNext)
      override def next(): (Array[Byte], Array[Byte]) =
        heads.filter(_.hasNext)
          .minBy(_.head._1)(KvShardPartitionReader.UnsignedBytes)
          .next()
    }
  }

  val UnsignedBytes: Ordering[Array[Byte]] =
    (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b)
}
