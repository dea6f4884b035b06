package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Exact distributed ordering operators: global rank and quantile banding
 * under a caller-supplied total order — the CCNet "head/middle/tail"
 * banding step (Wenzek et al. 2020 band documents by LM score and train
 * preferentially from the best band), and the general primitive behind
 * any "top p% of the corpus by X" decision.
 *
 * `row_number() over (order by …)` is the one-line spelling, but an
 * un-partitioned window funnels the entire corpus through a single task —
 * the same trap [[Packing.chunkSpans]] and [[Sampling.globalShuffle]]
 * engineer away. Rank here is the identical two-phase distributed prefix
 * sum: range-shuffle on the order key, per-partition counts, offsets
 * broadcast back, one in-partition pass. Offsets are keyed by each
 * partition's FIRST ROW (never a task id: a narrow coalesce merges
 * upstream partitions into one task, and `repartitionByRange` re-samples
 * boundaries per job — the eager localCheckpoint pins one layout for
 * both phases).
 */
object Ranking {

  /** Materialized range-sorted layout + (first-key -> offset, total) from
    * the per-partition counts — the shared skeleton of rank and bands.
    *
    * COST CONTRACT: the eager localCheckpoint materializes EVERY input
    * column into executor block storage for the call's lifetime. Rank a
    * NARROW projection (the order keys + an id, ~16 bytes/row — the
    * Packing.chunkSpans discipline) and join results back by id; handing
    * a raw document frame here would attempt to cache the corpus itself.
    * In-repo callers (lmScore bands, globalShuffle's (id, hash)) all
    * pass narrow frames. */
  private def rankedWithTotal(df: DataFrame, orderCols: Seq[String]): (DataFrame, Long) = {
    require(orderCols.nonEmpty, "globalRank: orderCols must be non-empty")
    // Offsets key on driver-side VALUE equality of the order tuple;
    // binary and nested types compare by reference there (an Array[Byte]
    // key would make every offset lookup miss with a misleading
    // "different range partitionings" error) — reject them up front.
    orderCols.foreach { c =>
      val t = df.schema(c).dataType
      val ok = !(t.isInstanceOf[org.apache.spark.sql.types.BinaryType] ||
        t.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
        t.isInstanceOf[org.apache.spark.sql.types.MapType] ||
        t.isInstanceOf[org.apache.spark.sql.types.StructType])
      require(ok, s"globalRank: order column '$c' has type ${t.simpleString}, " +
        "whose values do not compare by equality on the driver — use a " +
        "scalar key (hash binary keys to a long first)")
    }
    val spark = df.sparkSession
    val keys = orderCols.map(col)
    val ordered = df
      .repartitionByRange(spark.sparkContext.defaultParallelism, keys: _*)
      .sortWithinPartitions(keys: _*)
      .localCheckpoint(true)
    val idx = orderCols.map(ordered.schema.fieldIndex)
    // Range partitions map to increasing partition ids, so offsets come
    // from a pid-ordered prefix sum over the per-partition counts; the
    // lookup key is the partition's first order-key tuple.
    val parts = ordered
      .groupBy(spark_partition_id().as("_pid"))
      .agg(min(struct(keys: _*)).as("_first"), count(lit(1)).as("_cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getStruct(1).toSeq, r.getLong(2)))
      .sortBy(_._1)
    require(parts.map(_._2).distinct.length == parts.length,
      "globalRank: orderCols are not a total order (two range partitions " +
        "share a first key) — append a unique id column as the last key")
    val total = parts.map(_._3).sum
    val offsets: Map[Seq[Any], Long] =
      parts.map(_._2).zip(parts.map(_._3).scanLeft(0L)(_ + _).init).toMap
    val schema = StructType(ordered.schema.fields :+
      StructField("rank", LongType, nullable = false))
    val ranked = ordered.mapPartitions { it0 =>
      val it = it0.buffered
      if (!it.hasNext) Iterator.empty
      else {
        val h = it.head
        var pos = offsets.getOrElse(idx.map(h.get),
          throw new IllegalStateException(
            "globalRank: no offset for partition starting at " +
              s"${idx.map(h.get).mkString("(", ", ", ")")} — " +
              "the two phases saw different range partitionings"))
        it.map { r =>
          val out = Row.fromSeq(r.toSeq :+ pos)
          pos += 1
          out
        }
      }
    }(Encoders.row(schema))
    (ranked, total)
  }

  /**
   * Every input column plus `rank`: the exact 0-based global position of
   * the row under ascending lexicographic `orderCols`. The order must be
   * TOTAL (append a unique id as the last key) — ties across a range
   * boundary would make positions ambiguous, and the operator throws on
   * the detectable case rather than guessing.
   */
  def globalRank(df: DataFrame, orderCols: Seq[String]): DataFrame =
    rankedWithTotal(df, orderCols)._1

  /**
   * [[globalRank]] plus `band` in 1..n: `(rank * n) div N + 1`, the
   * even-remainder n-quantile split (band sizes differ by at most one).
   * All integer math — a SQL oracle replays it as
   * `((row_number() over (order by …) - 1) * n) // N + 1`. CCNet's
   * head/middle/tail is n = 3 over (lm score, doc id).
   */
  def bands(df: DataFrame, orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"bands: n must be >= 1, got $n")
    val (ranked, total) = rankedWithTotal(df, orderCols)
    if (total == 0) ranked.withColumn("band", lit(1L))
    else ranked.withColumn("band", expr(s"(rank * ${n}L) div ${total}L + 1L"))
  }
}
