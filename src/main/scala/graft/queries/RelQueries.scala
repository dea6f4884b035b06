package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * General relational surface (scan/filter/project/agg/join/window/top-k) —
 * beyond the reference (which has no SQL, SURVEY.md §2.5) but table stakes
 * for the engine and the bench headliners. Monetary aggregates use integer
 * cents so Spark and DuckDB agree bit-for-bit regardless of summation
 * order.
 */
object RelQueries {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style scan+agg over lineitem.
    "q1_agg" -> { (s, dir) =>
      Fixtures.table(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .as("sum_disc_scaled"),
          count(lit(1)).as("count_order"))
    },
    // TPC-H Q3-style 3-way join + agg + top-10.
    "q3_join" -> { (s, dir) =>
      val cust = Fixtures.table(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val ord = Fixtures.table(s, dir, "orders")
      val li = Fixtures.table(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("revenue_scaled"))
        .orderBy(col("revenue_scaled").desc, col("o_orderkey"))
        .limit(10)
    },
    // Window functions: per-customer order sequence + running spend.
    "q_window" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Fixtures.table(s, dir, "orders")
        .withColumn("order_seq", row_number().over(w).cast("long"))
        .withColumn(
          "running_cents",
          sum(cents(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("o_orderkey"), col("o_custkey"), col("order_seq"), col("running_cents"))
    },
    // Top-k with deterministic tie-break.
    "q_topk" -> { (s, dir) =>
      Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey"))
        .limit(15)
    },
    // ROLLUP hierarchy totals (multi-dimensional aggregate surface).
    "q_rollup" -> { (s, dir) =>
      Fixtures.table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          count(lit(1)).as("cnt"))
    },
    // Semi/anti joins (EXISTS / NOT EXISTS).
    "q_semi_anti" -> { (s, dir) =>
      val cust = Fixtures.table(s, dir, "customer")
      val ord = Fixtures.table(s, dir, "orders")
      val semi = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).withColumn("grp", lit("with_orders"))
      val anti = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).withColumn("grp", lit("without_orders"))
      semi.unionByName(anti).select(col("grp"), col("n"))
    },
    // Date scalar functions + two-level time rollup.
    "q_orders_by_month" -> { (s, dir) =>
      Fixtures.table(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
    },
    // TPC-H Q5-style 6-table join: the big fact tables shuffle-join on
    // their keys; supplier/nation/region ride along as broadcasts (the
    // 100 TB discipline: dimension tables never shuffle the fact table).
    "q5_region_revenue" -> { (s, dir) =>
      val region = Fixtures.table(s, dir, "region").where(col("r_name") === "ASIA")
      val nation = Fixtures.table(s, dir, "nation")
      val supp = Fixtures.table(s, dir, "supplier")
      val cust = Fixtures.table(s, dir, "customer")
      val ord = Fixtures.table(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Fixtures.table(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(
          broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("revenue_scaled"))
    },
    // Fact-to-dimension join + brand rollup (part is the broadcast dim).
    "q_brand_volume" -> { (s, dir) =>
      val part = Fixtures.table(s, dir, "part")
      Fixtures.table(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          count(lit(1)).as("n"))
    },
    // JSON scalar extraction from the events props column.
    "ev_json_extract" -> { (s, dir) =>
      Fixtures.table(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"), count(lit(1)).as("n"))
    })

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_scaled,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_scaled
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue_scaled DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_window" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(row_number() OVER w AS BIGINT) AS order_seq,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_topk" ->
      """SELECT l_partkey, count(*) AS cnt FROM lineitem
        |GROUP BY l_partkey ORDER BY cnt DESC, l_partkey LIMIT 15""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_semi_anti" ->
      """SELECT 'with_orders' AS grp, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS grp, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_orders_by_month" ->
      """SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
        |  CAST(date_part('month', o_orderdate) AS BIGINT) AS m,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_scaled
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q_brand_volume" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "ev_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(max(CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS max_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin)
}
