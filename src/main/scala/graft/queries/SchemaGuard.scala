package graft.queries

import org.apache.spark.sql.SparkSession

/**
 * Preflight for the driver-regenerated fixture tables: the testdata
 * generator has already flipped a column's physical type between rounds
 * (`events.ts` went TIMESTAMP(NANOS) → TIMESTAMP(MICROS), which under the
 * engine's `nanosAsLong` session flag silently changes the READ type from
 * BIGINT to TIMESTAMP_NTZ and broke every nanos consumer mid-query with
 * DATATYPE_MISMATCH). This guard fails FIRST and names the drifted
 * column, so a regeneration surprise reads as "events.ts drifted" instead
 * of an analyzer error 40 queries deep.
 *
 * Expectations are sets: a column with a known dual encoding the engine
 * normalizes at operator entry (`Events.tsAsNanos` accepts both ts
 * encodings) lists every acceptable read type; everything else is exact.
 */
object SchemaGuard {

  /** table → (column → acceptable Spark `DataType.simpleString`s), in
    * expected column order. Read types are AFTER session flags
    * (nanosAsLong), i.e. what every contract query actually consumes. */
  val Expected: Seq[(String, Seq[(String, Set[String])])] = {
    // Dual encodings are accepted ONLY for columns the engine normalizes
    // at operator entry: events.ts routes through Events.tsAsNanos
    // (Fixtures.table), so it may read as µs timestamp or legacy
    // ns-as-long bigint. orders/lineitem dates have NO such normalizer —
    // RelQueries does year()/timestamp comparisons directly — so they
    // must read as a timestamp; accepting bigint there would let a
    // TIMESTAMP(NANOS) regeneration pass preflight and still break
    // mid-Verify, the exact failure class this guard exists to front-run.
    val tsNormalized = Set("timestamp_ntz", "timestamp", "bigint")
    val tsOnly = Set("timestamp_ntz", "timestamp")
    Seq(
      "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
      "nation" -> Seq(
        "n_nationkey" -> Set("int"), "n_name" -> Set("string"),
        "n_regionkey" -> Set("int")),
      "customer" -> Seq(
        "c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
        "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
        "c_mktsegment" -> Set("string")),
      "supplier" -> Seq(
        "s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
        "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
      "part" -> Seq(
        "p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
        "p_brand" -> Set("string"), "p_type" -> Set("string"),
        "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
      "orders" -> Seq(
        "o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
        "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
        "o_orderdate" -> tsOnly, "o_orderpriority" -> Set("string")),
      "lineitem" -> Seq(
        "l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
        "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
        "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
        "l_discount" -> Set("double"), "l_tax" -> Set("double"),
        "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
        "l_shipdate" -> tsOnly),
      "events" -> Seq(
        "event_id" -> Set("bigint"), "ts" -> tsNormalized, "user_id" -> Set("bigint"),
        "event_type" -> Set("string"), "value" -> Set("double"),
        "props" -> Set("string")),
      "documents" -> Seq(
        "doc_id" -> Set("bigint"), "text" -> Set("string"),
        "lang" -> Set("string"), "source" -> Set("string"),
        "n_chars" -> Set("bigint")),
      "embeddings" -> Seq(
        "vec_id" -> Set("bigint"),
        // generator has shipped float vectors; double would also be fine
        // for every consumer (they cast), so accept both
        "embedding" -> Set("array<float>", "array<double>"),
        "label" -> Set("int", "bigint")))
  }

  /** Check every fixture table under `sfDir` (or the subset that exists —
    * a missing table is the driver's concern, not drift). Throws
    * IllegalStateException naming table + column + got + expected on the
    * FIRST drifted column; extra columns are tolerated (additive
    * generation is not drift), missing ones are not. */
  def check(spark: SparkSession, sfDir: String): Unit =
    Expected.foreach { case (table, cols) =>
      val path = s"$sfDir/$table.parquet"
      val exists =
        new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(new org.apache.hadoop.fs.Path(path))
      if (exists) {
        // The session comes from graft.core.Sessions.builder, which owns
        // every read-shaping conf (nanosAsLong included) — do NOT set
        // conf here: the guard must see the read types the queries will,
        // not types under a locally-mutated session.
        val got = spark.read.parquet(path).schema
          .map(f => f.name -> f.dataType.simpleString).toMap
        cols.foreach { case (name, accept) =>
          got.get(name) match {
            case None => throw new IllegalStateException(
              s"fixture schema drift: $table.$name is MISSING from $path " +
                s"(present: ${got.keys.toSeq.sorted.mkString(", ")}) — " +
                "the testdata generator changed; update the engine's readers " +
                "(and SchemaGuard.Expected) together")
            case Some(t) if !accept(t) => throw new IllegalStateException(
              s"fixture schema drift: $table.$name reads as $t, expected " +
                s"${accept.toSeq.sorted.mkString(" | ")} ($path) — the testdata " +
                "generator changed this column's physical type; normalize it at " +
                "the fixture boundary (the Events.tsAsNanos pattern) before any " +
                "query consumes it, then update SchemaGuard.Expected")
            case _ => ()
          }
        }
        // Beyond types: the embedding DIMENSION is a contract constant
        // (SimQueries.EmbeddingDim pins quantizers, PQ subspaces, and
        // the generated oracles to it) that no schema carries — probe one
        // row so a regenerated corpus with a new dim fails named here,
        // not inside a PQ dim-divisibility require 30 queries later.
        if (table == "embeddings") {
          // take(1), never head(): the guard must stay NAMED on an empty
          // or null-first-row regeneration, not die with its own
          // NoSuchElement/NPE stack
          val probe = spark.read.parquet(path)
            .select(org.apache.spark.sql.functions.size(
              org.apache.spark.sql.functions.col("embedding")).as("d"))
            .take(1)
          val dim =
            if (probe.isEmpty || probe(0).isNullAt(0)) None else Some(probe(0).getInt(0))
          if (!dim.contains(SimQueries.EmbeddingDim)) throw new IllegalStateException(
            s"fixture schema drift: embeddings.embedding has " +
              s"${dim.map(_.toString).getOrElse("no probeable (empty table / null)")} " +
              s"elements, the engine's contract constants assume " +
              s"${SimQueries.EmbeddingDim} (SimQueries.EmbeddingDim pins quantizer " +
              "dims, PQ subspaces, and the generated oracles) — update the constant " +
              "and re-derive its dependents together")
        }
      }
    }
}
