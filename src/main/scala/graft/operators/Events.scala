package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream operators (batch forms; graft.streaming hosts the
 * Structured-Streaming twins).
 *
 * Convention: the `ts` column is **nanoseconds since epoch as BIGINT**
 * (Spark has no nanosecond timestamp type; parquet TIMESTAMP(NANOS) is
 * read via spark.sql.legacy.parquet.nanosAsLong). All window/gap math is
 * integer nanoseconds — exact, overflow-free until year 2262, and
 * bit-identical in any engine. Money sums use integer cents for the same
 * reason. Sources that deliver `ts` as a TIMESTAMP/TIMESTAMP_NTZ column
 * (µs-typed parquet — the testdata convention since r6) are normalized
 * at operator entry by [[tsAsNanos]], so both encodings are accepted.
 */
object Events {

  def cents(c: Column): Column = round(c * 100).cast("long")

  private val NanosPerSecond = 1000000000L

  /** Normalize `c` to the engine's ns-since-epoch BIGINT convention:
    * BIGINT passes through, TIMESTAMP / TIMESTAMP_NTZ converts via exact
    * integer µs x 1000 (the session is pinned UTC in
    * [[graft.core.Sessions]], so an NTZ wall-clock IS the epoch instant).
    * Anything else fails at analysis, not mid-job. */
  def tsAsNanos(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(c, unix_micros(col(c).cast("timestamp")) * lit(1000L))
      case t => throw new IllegalArgumentException(
        s"column '$c' must be BIGINT nanos or a timestamp type, got $t")
    }

  /** Epoch-aligned time bucket of `c` under `bucketNs`-wide buckets.
    * Floor division, not `div` (which truncates toward zero): pre-epoch
    * timestamps must land in their own bucket, matching SQL's `//`. The
    * one shared definition for windows, the bucketized as-of join, and
    * the interval join — these must never drift apart. */
  private def floorBucket(c: Column, bucketNs: Long): Column =
    ((c - pmod(c, lit(bucketNs))) / lit(bucketNs)).cast("long")

  /** Tumbling-window aggregation: epoch-aligned windows, counts + exact
    * sums per (window, event_type). */
  def windowAgg(df0: DataFrame, minutes: Int): DataFrame = {
    val df = tsAsNanos(df0)
    val bucketNs = minutes * 60L * NanosPerSecond
    val bucket = floorBucket(col("ts"), bucketNs)
    df.groupBy(
        timestamp_seconds(bucket * (minutes * 60L)).as("w_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Ordering is by
    * exact nanosecond timestamp with event_id tie-break.
    *
    * Scale note: this window partitions by USER — one task owns a hot
    * user's entire history (a 10⁹-event bot = a straggler task). It is
    * the audit/equivalence twin; the production path at corpus scale is
    * [[sessionizeBucketed]], identical output with per-task work bounded
    * by one (user, time-bucket). */
  def sessionize(df0: DataFrame, gapMinutes: Int): DataFrame = {
    val df = tsAsNanos(df0)
    val gapNs = gapMinutes * 60L * NanosPerSecond
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    df.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats built on [[sessionize]]. */
  def sessionStats(df: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(df, gapMinutes)
      .groupBy(col("user_id"))
      .agg(
        max(col("session_idx")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))

  /**
   * Skew-proof [[sessionize]]: identical output, but the big window
   * partitions by (user, time bucket) instead of user alone — the
   * [[asOfJoinBucketed]] pattern. The plain formulation funnels a user's
   * ENTIRE history through one task; a bot/service account with 10⁸–10⁹
   * events is then a multi-GB straggler partition at 100 TB. Here
   * per-task work is bounded by one (user, bucket) cell, and the
   * cross-bucket handoff is ONE row of running state per (user, bucket):
   *   1. in-bucket lag + row_number over (user, bucket);
   *   2. a summary frame — per (user, bucket): first/last ts and the
   *      count of in-bucket session starts — windowed per user over
   *      BUCKETS (rows per user = bucket count, not event count) to
   *      carry the previous bucket's last ts and the session-index
   *      offset;
   *   3. summaries join back on (user, bucket) — the big side keeps its
   *      step-1 partitioning, so the event log crosses a shuffle ONCE.
   * Bucket boundaries are a function of ts, so the concatenated
   * (bucket, ts, event_id) order IS the plain window's (ts, event_id)
   * order; equivalence at every bucket width is property-tested and the
   * driver oracle for the contract query is the plain-window SQL.
   *
   * Null semantics match the plain window exactly (partitionBy groups
   * nulls; null ts sorts first): null users and null timestamps land in
   * their own (user, bucket) groups via a NULL-SAFE carry join — a plain
   * equi-join would orphan every bucket of a null user from its carry
   * and overcount its sessions.
   */
  def sessionizeBucketed(df0: DataFrame, gapMinutes: Int, bucketNs: Long): DataFrame = {
    require(bucketNs >= 1, s"sessionizeBucketed: bucketNs must be >= 1, got $bucketNs")
    val df = tsAsNanos(df0)
    val gapNs = gapMinutes * 60L * NanosPerSecond
    val origCols = df.columns.toSeq
    val reserved = Seq(
      "_bucket", "_rn", "_prev_in", "_last_ts", "_first_ts", "_n_in",
      "_c_user", "_c_bucket", "_prev_last", "_offset",
      "prev_ts", "new_session", "session_idx")
    require(
      origCols.forall(c => !reserved.contains(c)),
      s"sessionizeBucketed: input columns must not use the reserved names ${reserved.mkString(",")}")
    val withBucket = df.withColumn("_bucket", floorBucket(col("ts"), bucketNs))
    val wIn = Window
      .partitionBy(col("user_id"), col("_bucket"))
      .orderBy(col("ts"), col("event_id"))
    // 1. in-bucket predecessor + position
    val phase1 = withBucket
      .withColumn("_prev_in", lag(col("ts"), 1).over(wIn))
      .withColumn("_rn", row_number().over(wIn))
    // 2. one summary row per (user, bucket): last/first ts and the count
    // of NON-first in-bucket session starts (the first event's start is
    // decided at the summary level, where the previous bucket's last ts
    // is in hand). `_prev_in.isNull` beyond row 1 happens only in the
    // null-ts bucket, where the plain window also hands every row a null
    // prev_ts — counted as a start in both formulations.
    val summaries = phase1
      .groupBy(col("user_id"), col("_bucket"))
      .agg(
        max(col("ts")).as("_last_ts"),
        min(col("ts")).as("_first_ts"),
        sum(when(col("_rn") > 1 &&
            (col("_prev_in").isNull || col("ts") - col("_prev_in") > gapNs), 1L)
          .otherwise(0L)).as("_n_in"))
    val wAcross = Window.partitionBy(col("user_id")).orderBy(col("_bucket"))
    val carries = summaries
      .withColumn("_prev_last", lag(col("_last_ts"), 1).over(wAcross))
      .withColumn("_b_start", when(col("_prev_last").isNull ||
          col("_first_ts") - col("_prev_last") > gapNs, 1L).otherwise(0L))
      .withColumn("_offset", coalesce(
        sum(col("_n_in") + col("_b_start")).over(
          wAcross.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(
        col("user_id").as("_c_user"), col("_bucket").as("_c_bucket"),
        col("_prev_last"), col("_offset"))
    // 3. null-safe carry join on (user, bucket) — big side already
    // partitioned on exactly these keys by the step-1 window.
    val joined = phase1.join(
      carries,
      col("user_id") <=> col("_c_user") && col("_bucket") <=> col("_c_bucket"),
      "left")
    val withSession = joined
      // NOT coalesce: in the null-ts bucket a non-first row's prev_ts is
      // the previous row's null ts and must STAY null, never fall back
      // to a carried value
      .withColumn("prev_ts", when(col("_rn") === 1, col("_prev_last")).otherwise(col("_prev_in")))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      // _offset is never null here: carries coalesces it to 0 at build
      // and the null-safe join matches every (user, bucket) group by
      // construction (carries derives from the same groups)
      .withColumn("session_idx", col("_offset") + sum(col("new_session")).over(
        wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSession.select(
      (origCols.map(col) :+ col("prev_ts") :+ col("new_session") :+ col("session_idx")): _*)
  }

  /** Per-user session stats built on [[sessionizeBucketed]] — same output
    * as [[sessionStats]], hot-user-proof. */
  def sessionStatsBucketed(df: DataFrame, gapMinutes: Int, bucketNs: Long): DataFrame =
    sessionizeBucketed(df, gapMinutes, bucketNs)
      .groupBy(col("user_id"))
      .agg(
        max(col("session_idx")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))

  /**
   * As-of join: each probe row picks up the latest reference row with the
   * same key and `ref.ts <= probe.ts` (left semantics — unmatched probes
   * keep null payload). Optional `toleranceNs` voids matches older than
   * `probe.ts - toleranceNs`.
   *
   * Implemented with the union + running-last window pattern: tag both
   * inputs, union them, and carry the last reference payload forward in
   * one ordered window pass per key. Cost is a single shuffle on the key
   * over |probe| + |ref| rows — never the range-expansion join
   * (`probe JOIN ref ON key AND ref.ts <= probe.ts` then max-per-probe),
   * which materializes O(|probe| x |ref per key|) intermediates and dies
   * on exactly the hot keys a 100 TB event log has. Reference rows sort
   * before probe rows at equal ts, giving `<=` (not `<`) semantics.
   *
   * `payload` columns must not collide with probe columns (select/rename
   * the reference first); if several reference rows share a (key, ts) the
   * winner follows the sort's tie order — deduplicate per (key, ts)
   * upstream when the payload must be deterministic.
   *
   * Null handling mirrors SQL join equality: reference rows with a null
   * key or null ts are dropped (they could never match), probe rows with
   * nulls are KEPT with a null payload (left semantics).
   */
  def asOfJoin(
      probe: DataFrame,
      ref: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String],
      toleranceNs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asOfJoin: at least one key column")
    require(payload.nonEmpty, "asOfJoin: at least one payload column")
    val probeCols = probe.columns.toSeq
    require(
      payload.forall(p => !probeCols.contains(p) && p != "asof_ts"),
      s"asOfJoin: payload columns ${payload.mkString(",")} must not collide with probe columns")
    val reserved = Seq("_is_ref", "_asof", "_m", "asof_ts")
    require(
      probeCols.forall(c => !reserved.contains(c)),
      s"asOfJoin: probe columns must not use the reserved names ${reserved.mkString(",")}")
    val refTagged = ref
      // a null-keyed/null-ts reference can never match under SQL equality
      // semantics; without this filter the window's null GROUPING would
      // hand null-keyed probes a bogus match
      .where(keys.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .select(
        (keys :+ tsCol).map(col) :+
          lit(1).as("_is_ref") :+
          struct(col(tsCol).as("asof_ts") +: payload.map(col): _*).as("_asof"): _*)
    val probeTagged = probe.withColumn("_is_ref", lit(0))
    // unionByName fills the side-specific columns (probe payload on ref
    // rows, _asof on probe rows) with nulls.
    val unioned = probeTagged.unionByName(refTagged, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc_nulls_first, col("_is_ref").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_m", last(col("_asof"), ignoreNulls = true).over(w))
      .where(col("_is_ref") === 0)
    val inRange = toleranceNs match {
      case Some(tol) =>
        carried.withColumn(
          "_m", when(col(tsCol) - col("_m.asof_ts") <= tol, col("_m")))
      case None => carried
    }
    inRange.select(
      probeCols.map(col) :+ col("_m.asof_ts").as("asof_ts") :++
        payload.map(p => col(s"_m.$p").as(p)): _*)
  }

  /**
   * Interval (range) join: each point row matches every interval row of
   * the same key with `start <= ts < end`. Spark has no native range
   * join — the naive `points JOIN intervals ON key AND ts BETWEEN …`
   * plans as a broadcast-nested-loop or a key-only shuffle join whose
   * post-filter explodes on hot keys. This formulation bucketizes time:
   * each interval replicates to the `ceil(len / bucketNs)` buckets it
   * overlaps, each point maps to exactly ONE bucket, and the join is a
   * plain equi-join on (key, bucket) + a residual range filter. Because
   * a point has one bucket, every qualifying (point, interval) pair
   * appears exactly once — no dedup pass. Pick `bucketNs` near the
   * typical interval length: replication stays ~2x and per-task work is
   * bounded by a (key, bucket) cell, not a key's whole history.
   *
   * `intervals` columns (besides the keys) must not collide with point
   * columns; both frames keep all their columns in the output. An
   * interval spanning more than `maxBucketsPerInterval` buckets fails
   * LOUD (assert inside the plan): an open-ended sentinel like
   * `end = Long.MaxValue` would otherwise explode to billions of
   * replicas and OOM the job — clamp sentinels (or raise `bucketNs`)
   * upstream, where their intended semantics is known.
   */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketNs: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketNs >= 1, s"intervalJoin: bucketNs must be >= 1, got $bucketNs")
    require(keys.nonEmpty, "intervalJoin: at least one key column")
    require(maxBucketsPerInterval >= 1, "intervalJoin: maxBucketsPerInterval must be >= 1")
    val reserved = Seq("_bucket")
    require(
      (points.columns ++ intervals.columns).forall(c => !reserved.contains(c)),
      "intervalJoin: _bucket is reserved")
    val b0 = floorBucket(col(startCol), bucketNs)
    val b1 = floorBucket(col(endCol) - 1, bucketNs)
    val spanOk = assert_true(
      b1 - b0 < lit(maxBucketsPerInterval.toLong),
      concat(lit(s"intervalJoin: an interval spans > $maxBucketsPerInterval buckets of $bucketNs ns " +
        "— clamp open-ended sentinels or raise bucketNs; offending start="),
        col(startCol).cast("string"), lit(" end="), col(endCol).cast("string")))
    // empty/invalid intervals (end <= start) match nothing, and sequence()
    // would reverse direction on them — drop them up front
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("_bucket", explode(sequence(b0, when(spanOk.isNull, b1))))
    val pt = points.withColumn("_bucket", floorBucket(col(tsCol), bucketNs))
    pt.join(iv, keys :+ "_bucket")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bucket")
  }

  /**
   * Skew-proof [[asOfJoin]]: same semantics, but the big window
   * partitions by (key, time bucket) instead of key alone. The plain
   * formulation funnels a key's ENTIRE history through one task — fine
   * for organic keys, a straggler ceiling for the hot keys a 100 TB
   * event log always has (bots, load tests, default ids). Here per-task
   * work is bounded by one bucket of one key, and the cross-bucket state
   * handoff rides a small summary frame (one row per key x bucket):
   *   1. in-bucket running-last window over (key, bucket);
   *   2. per-bucket last reference via max_by, then a running-last window
   *      over the PRECEDING buckets' summaries (rows per key = bucket
   *      count, not event count);
   *   3. each probe takes its in-bucket carry, falling back to the
   *      previous buckets' carry.
   * Same preconditions as [[asOfJoin]]; `bucketNs` trades shuffle width
   * (two big-side shuffles instead of one) for the bounded task size.
   */
  def asOfJoinBucketed(
      probe: DataFrame,
      ref: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String],
      bucketNs: Long,
      toleranceNs: Option[Long] = None): DataFrame = {
    require(bucketNs >= 1, s"asOfJoinBucketed: bucketNs must be >= 1, got $bucketNs")
    require(keys.nonEmpty, "asOfJoinBucketed: at least one key column")
    require(payload.nonEmpty, "asOfJoinBucketed: at least one payload column")
    val probeCols = probe.columns.toSeq
    val reserved = Seq("_is_ref", "_asof", "_m", "_bucket", "_prev", "asof_ts")
    require(
      payload.forall(p => !probeCols.contains(p) && p != "asof_ts"),
      s"asOfJoinBucketed: payload columns ${payload.mkString(",")} must not collide with probe columns")
    require(
      probeCols.forall(c => !reserved.contains(c)),
      s"asOfJoinBucketed: probe columns must not use the reserved names ${reserved.mkString(",")}")
    val refTagged = ref
      // same null rule as asOfJoin: null-keyed/null-ts refs never match
      .where(keys.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .select(
        (keys :+ tsCol).map(col) :+
          lit(1).as("_is_ref") :+
          struct(col(tsCol).as("asof_ts") +: payload.map(col): _*).as("_asof"): _*)
    val probeTagged = probe.withColumn("_is_ref", lit(0))
    val unioned = probeTagged.unionByName(refTagged, allowMissingColumns = true)
      .withColumn("_bucket", floorBucket(col(tsCol), bucketNs))
    val keyCols = keys.map(col)
    // 1. in-bucket running last
    val wInBucket = Window
      .partitionBy(keyCols :+ col("_bucket"): _*)
      .orderBy(col(tsCol).asc, col("_is_ref").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = unioned.withColumn(
      "_m", last(col("_asof"), ignoreNulls = true).over(wInBucket))
    // 2. per-bucket last reference, then running last over PRIOR buckets
    val summaries = unioned
      .groupBy(keyCols :+ col("_bucket"): _*)
      .agg(max_by(col("_asof"), when(col("_is_ref") === 1, col(tsCol))).as("_blast"))
    val wAcross = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = summaries
      .withColumn("_prev", last(col("_blast"), ignoreNulls = true).over(wAcross))
      .select(keyCols :+ col("_bucket") :+ col("_prev"): _*)
    // 3. combine; the join key (keys, _bucket) matches step 1's window
    // partitioning, so the big side is not re-shuffled a third time.
    // LEFT join: a probe with a null key or null ts has no carries match
    // (null != null) but must survive with a null payload, exactly like
    // the plain operator's left semantics — an inner join would silently
    // drop those probe rows.
    val carried = withLocal
      .join(carries, keys :+ "_bucket", "left")
      .withColumn("_m", coalesce(col("_m"), col("_prev")))
      .where(col("_is_ref") === 0)
      .drop("_prev", "_bucket")
    val inRange = toleranceNs match {
      case Some(tol) =>
        carried.withColumn(
          "_m", when(col(tsCol) - col("_m.asof_ts") <= tol, col("_m")))
      case None => carried
    }
    inRange.select(
      probeCols.map(col) :+ col("_m.asof_ts").as("asof_ts") :++
        payload.map(p => col(s"_m.$p").as(p)): _*)
  }

  /**
   * Ordered conversion funnel: per user, how many of `stages` were
   * reached IN ORDER — stage i counts only if an event of its type
   * occurs STRICTLY after the time stage i-1 was first reached (each
   * stage's reach time is the earliest qualifying event). Output: one
   * row per distinct user, `stage` = stages completed (0 = never did
   * stage 0). The product-analytics question every event log gets asked
   * (view → click → purchase), stated so every engine agrees exactly:
   * reach times are minima (no tie-breaking needed), advancement is a
   * strict timestamp comparison.
   *
   * Scale posture: one frontier aggregation per stage, every shuffle
   * keyed on the user — per-task state is one (user, min-ts) pair, so a
   * hot user costs nothing extra (never a collect-events-per-user
   * window). Stage count is human-sized by contract, so the driver-side
   * loop over stages is fine at any corpus size.
   */
  def funnel(
      df0: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: need at least one stage")
    require(stages.distinct == stages, s"funnel: duplicate stage in $stages")
    val df = tsAsNanos(df0, tsCol)
    val users = df.select(col(userCol)).distinct()
    // frontier i: users who completed stage i, with its reach time
    val frontiers = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val candidates = df.where(col(typeCol) === lit(stage))
        val qualified = prev match {
          case None => candidates
          case Some(p) =>
            candidates.join(
              p.select(col(userCol), col("_t").as("_t_prev")), Seq(userCol))
              .where(col(tsCol) > col("_t_prev"))
        }
        Some(qualified.groupBy(col(userCol)).agg(min(col(tsCol)).as("_t")))
    }.flatten
    // stage = highest completed frontier; frontiers are nested by
    // construction, so marker count == highest index + 1
    val marked = frontiers.zipWithIndex.foldLeft(users) { case (acc, (f, i)) =>
      acc.join(f.select(col(userCol), lit(1).as(s"_s$i")), Seq(userCol), "left")
    }
    val stage = frontiers.indices.foldLeft(lit(0)) { case (acc, i) =>
      when(col(s"_s$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    marked.select(col(userCol), stage.cast("int").as("stage"))
  }

  /**
   * Cohort retention: users bucket into cohorts by their FIRST-seen
   * epoch-aligned time bucket; every (user, bucket) activity then counts
   * toward `(cohort, period = bucket - cohort)`. Output: one row per
   * (cohort, period) with the distinct-user count — the retention
   * matrix ("of the users who arrived in week w, how many were active k
   * weeks later"). Period 0 row of a cohort = its size.
   *
   * Scale posture: distinct-per-(user, bucket) then two aggregations,
   * all keyed on the user — no windows, no per-user collections.
   */
  def retention(
      df0: DataFrame,
      userCol: String,
      tsCol: String,
      bucketNs: Long): DataFrame = {
    require(bucketNs > 0, s"retention: bucketNs $bucketNs must be positive")
    val b = tsAsNanos(df0, tsCol)
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), floorBucket(col(tsCol), bucketNs).as("_bucket"))
      .distinct()
    val cohorts = b.groupBy(col(userCol)).agg(min(col("_bucket")).as("cohort"))
    b.join(cohorts, Seq(userCol))
      .groupBy(col("cohort"), (col("_bucket") - col("cohort")).as("period"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * Event-path transitions: per user, order events by (ts, tiebreak id —
   * equal timestamps are real in event data and the order must be
   * deterministic for the oracle), pair each event with its predecessor,
   * and count every (from_type → to_type) edge across all users — the
   * Markov-transition census behind "what do users do next" path
   * analytics (the companion of [[funnel]], which asks about ONE fixed
   * path). Null users/timestamps/types are excluded (no position in any
   * path).
   *
   * Scale posture: one shuffle keyed on user; the per-user lag window's
   * task state is one row (no collections), but its PARTITION is bounded
   * by a single user's whole activity — a hot user straggles one task.
   * This is the audit/equivalence twin; the production path is
   * [[transitionsBucketed]], identical output with per-task work bounded
   * by one (user, time-bucket). The edge aggregation is
   * map-side-combined on (from, to), whose cardinality is |types|²
   * regardless of corpus size.
   */
  def transitions(
      df0: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    // null tiebreak ids are excluded like null users/timestamps/types: a
    // row with no deterministic position in its user's path cannot form
    // deterministic edges (and Spark orders nulls FIRST where SQL engines
    // default to LAST — an engine-divergent tie is exactly what the
    // tiebreak column exists to prevent)
    val df = tsAsNanos(df0, tsCol).where(
      col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    df.select(
        col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /**
   * Skew-proof [[transitions]]: identical output, per-task work bounded
   * by one (user, time bucket) instead of a user's whole history — the
   * [[asOfJoinBucketed]] / [[sessionizeBucketed]] pattern. Consecutive
   * events either share a bucket (an in-bucket lag pair) or straddle a
   * bucket boundary; the boundary edges come from a summary frame — one
   * row per (user, non-empty bucket) carrying the bucket's first/last
   * event type — lagged per user over BUCKETS (empty buckets simply
   * don't appear, so lag(1) is the previous event regardless of gaps).
   * The event log crosses a shuffle once; everything after the summary
   * aggregation is bucket-count-sized, and the final edge aggregation is
   * map-side-combined on a |types|²-sized key space.
   *
   * Identity with [[transitions]] holds under the tiebreak contract both
   * formulations document: (user, ts, id) unique — that is what makes
   * the PLAIN operator's order deterministic in the first place. With
   * duplicated tie keys both formulations are nondeterministic (the
   * window's tie order and min_by/max_by's tie pick are independent
   * arbitrary choices) and may disagree with each other.
   */
  def transitionsBucketed(
      df0: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      bucketNs: Long): DataFrame = {
    require(bucketNs >= 1, s"transitionsBucketed: bucketNs must be >= 1, got $bucketNs")
    // same null exclusions as the plain operator
    val df = tsAsNanos(df0, tsCol).where(
      col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
    val withBucket = df.withColumn("_bucket", floorBucket(col(tsCol), bucketNs))
    val wIn = Window
      .partitionBy(col(userCol), col("_bucket"))
      .orderBy(col(tsCol), col(idCol))
    val inPairs = withBucket
      .select(
        col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(wIn).as("from_type"))
      .where(col("from_type").isNotNull)
    // bucket-boundary edges: previous non-empty bucket's last event type
    // → this bucket's first event type, per user. min_by/max_by partials
    // combine MAP-SIDE, so a hot (user, bucket) collapses to one row per
    // map task before its exchange — that shuffle carries summary-keyed
    // partials, never event-log rows (pinned in PlanShapeSpec).
    val summaries = withBucket
      .groupBy(col(userCol), col("_bucket"))
      .agg(
        min_by(col(typeCol), struct(col(tsCol), col(idCol))).as("_first"),
        max_by(col(typeCol), struct(col(tsCol), col(idCol))).as("_last"))
    val wAcross = Window.partitionBy(col(userCol)).orderBy(col("_bucket"))
    val crossPairs = summaries
      .withColumn("from_type", lag(col("_last"), 1).over(wAcross))
      .where(col("from_type").isNotNull)
      .select(col("from_type"), col("_first").as("to_type"))
    inPairs.unionByName(crossPairs)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }
}
