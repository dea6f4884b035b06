package graft.sources

import java.util.OptionalLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportOrdering, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{BinaryType, IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.KvFile

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

  // Driver-side conf hand-off (see class doc). Keyed by version dir:
  // idempotent re-registration, bounded by the number of distinct domain
  // versions a driver ever reads through this source.
  private val confs =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  def registerConf(versionDir: String, entries: Seq[(String, String)]): Unit =
    confs.put(versionDir, entries)

  private[sources] def confFor(versionDir: String): Seq[(String, String)] =
    Option(confs.get(versionDir)).getOrElse(Seq.empty)

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
    with SupportsPushDownFilters {

  private var required: StructType = KvDomainV2.Schema
  private var keepShards: Option[Set[Int]] = None
  private var keyRange: KvDomainV2.KeyRange = KvDomainV2.KeyRange()
  private var pushed: Array[Filter] = Array.empty

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

  override def build(): Scan =
    new KvDomainScan(versionDir, numShards, required, keepShards, keyRange)
}

class KvDomainScan(
    versionDir: String,
    numShards: Int,
    required: StructType,
    keepShards: Option[Set[Int]],
    keyRange: KvDomainV2.KeyRange = KvDomainV2.KeyRange())
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
      (if (keyRange.isUnbounded) "" else s" keyRange=$keyRange")

  override def planInputPartitions(): Array[InputPartition] =
    shards.map(s => KvShardInputPartition(s, s"$versionDir/shard=$s")).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    KvDomainReaderFactory(KvDomainV2.confFor(versionDir), required.fieldNames.toSeq, keyRange)

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
    var bytes = 0L
    var rows = 0L
    shards.foreach { s =>
      val d = new Path(s"$versionDir/shard=$s")
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
    keyRange: KvDomainV2.KeyRange = KvDomainV2.KeyRange())
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvShardInputPartition]
    new KvShardPartitionReader(p.shard, p.shardDir, confEntries, fields, keyRange)
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
    keyRange: KvDomainV2.KeyRange = KvDomainV2.KeyRange())
    extends PartitionReader[InternalRow] {

  private val needValue = fields.contains("value")

  private val conf: Configuration = KvDomainV2.rebuild(confEntries)

  private var readers: Seq[KvFile.Reader] = Seq.empty

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
      streams match {
        case Seq() => Iterator.empty
        case Seq(one) => one
        case many => KvShardPartitionReader.mergeSorted(many)
      }
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
