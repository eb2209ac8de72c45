package graft.operators

import graft.{Det, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational query surface.
  *
  * The reference delegates interactive SQL to an RDBMS (sqlproxy.mjs:68-78 in
  * /root/reference) — aggregation, joins, windows, set ops all run there. In
  * the Spark rebuild these are first-class Catalyst plans. Each query below is
  * a representative of one operator family from SURVEY.md §2.3-§2.8, written
  * DataFrame-first so Catalyst gets full pushdown/pruning/join-selection
  * freedom, and paired with a DuckDB oracle in [[oracleSql]].
  *
  * Scale notes (100 TB design intent), per query:
  *  - aggregations are partial+final (map-side combine) automatically;
  *  - dimension joins (region/nation/customer) are explicitly broadcast;
  *  - fact-fact joins shuffle on the join key and rely on AQE for skew;
  *  - filters are plain parquet-pushable predicates (verified via .explain in
  *    ExplainSpec — PushedFilters must be non-empty).
  */
object CoreQueries {
  private val D = DecimalType(38, 6)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation family (SURVEY §2.4) -------------------------------
    "q01_pricing_summary" -> ((s, d) => {
      T.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_base_price"),
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("sum_charge"),
          Det.davg(col("l_quantity")).as("avg_qty"),
          Det.davg(col("l_extendedprice")).as("avg_price"),
          Det.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_selective_agg" -> ((s, d) => {
      // TPC-H Q6 shape: highly selective filters that must reach the scan.
      T.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(Det.dsum(col("l_extendedprice") * col("l_discount"))
          .as("revenue"))
    }),

    // ---- join family (SURVEY §2.3) --------------------------------------
    "q03_join_topk" -> ((s, d) => {
      // Shuffled fact-fact join + broadcast-size dim filter + top-k.
      val c = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = T.orders(s, d)
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = T.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q05_broadcast_dims" -> ((s, d) => {
      // Star join: two tiny dims broadcast, fact shuffles once for the agg.
      val o = T.orders(s, d)
      val c = T.customer(s, d)
      val n = T.nation(s, d)
      val r = T.region(s, d)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(Det.dsum(col("o_totalprice")).as("total_sales"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q04_semi_join" -> ((s, d) => {
      // EXISTS via left_semi: priorities of orders having a discounted line.
      val o = T.orders(s, d)
      val l = T.lineitem(s, d).filter(col("l_discount") > 0.08)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    "q09_anti_join" -> ((s, d) => {
      // NOT EXISTS via left_anti: customers with no high-value orders.
      val c = T.customer(s, d)
      val o = T.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
        .limit(100)
    }),

    // ---- window family (SURVEY §2.5) ------------------------------------
    "q06_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T.orders(s, d)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
          col("o_totalprice"))
        .filter(col("o_custkey") <= 200)
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    "q07_window_running" -> ((s, d) => {
      // Running sum per user; decimal-routed so tree-vs-sequential window
      // aggregation in either engine yields identical doubles.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, d)
        .filter(col("user_id") <= 20)
        .withColumn("running_value",
          sum(col("value").cast(D)).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- set ops / distinct (SURVEY §2.7) -------------------------------
    "q08_setops" -> ((s, d) => {
      val custNations = T.customer(s, d)
        .select(col("c_nationkey").cast("int").as("nationkey")).distinct()
      val suppNations = T.supplier(s, d)
        .select(col("s_nationkey").cast("int").as("nationkey")).distinct()
      custNations.intersect(suppNations)
        .union(custNations.except(suppNations))
        .distinct()
        .orderBy(col("nationkey"))
    }),

    // ---- grouping sets (SURVEY §2.4) ------------------------------------
    "q10_rollup" -> ((s, d) => {
      T.orders(s, d)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    }),

    // Full CUBE + grouping_id — every aggregation level in one pass
    // (Spark expands grouping sets map-side into a single shuffled
    // aggregate, not one job per level).
    "q67_cube" -> ((s, d) => {
      T.orders(s, d)
        .cube(col("o_orderstatus"), year(col("o_orderdate")).as("o_year"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("total"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_year").asc_nulls_first)
    }),

    // Pivot: event types to columns, one row per value bucket. The pivot
    // values are declared (not discovered), so the plan is one shuffled
    // aggregate with a conditional-agg column per value — identical to
    // the FILTER-clause SQL the oracle runs, and no extra distinct pass.
    "q68_pivot" -> ((s, d) => {
      T.events(s, d)
        .withColumn("bucket",
          when(col("value") < 10, "low")
            .when(col("value") < 100, "mid").otherwise("high"))
        .groupBy(col("bucket"))
        .pivot("event_type",
          Seq("click", "view", "purchase", "error", "signup"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("bucket"))
    }),

    // ---- sort / top-k (SURVEY §2.6) -------------------------------------
    "q11_topk" -> ((s, d) => {
      T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_quantity"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(20)
    }),

    // ---- scalar functions (SURVEY §2.8) ---------------------------------
    "q12_datetime" -> ((s, d) => {
      T.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_year"), col("o_month"))
    }),

    "q13_case_coalesce" -> ((s, d) => {
      T.events(s, d)
        .withColumn("bucket",
          when(col("value") < 10, "low")
            .when(col("value") < 100, "mid")
            .otherwise("high"))
        .withColumn("v", coalesce(nullif(col("value"), lit(0.0)), lit(-1.0)))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("v")).as("sum_v"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    "q14_regexp_json" -> ((s, d) => {
      // The reference stores nested JSON as opaque columns (SURVEY §1.2);
      // here: regex field extraction from the JSON-string `props`.
      T.events(s, d)
        .withColumn("k",
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).try_cast("int"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), Det.davg(col("value")).as("avg_value"))
        .orderBy(col("k_mod"))
    }),

    "q15_string_funcs" -> ((s, d) => {
      T.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          length(col("c_name")).as("name_len"),
          concat_ws("|", col("c_mktsegment"),
            col("c_nationkey").cast("string")).as("seg_nation"))
        .filter(col("c_custkey") <= 100)
        .orderBy(col("c_custkey"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Det.sqlSum("l_quantity")} AS sum_qty,
         |  ${Det.sqlSum("l_extendedprice")} AS sum_base_price,
         |  ${Det.sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${Det.sqlSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${Det.sqlAvg("l_quantity")} AS avg_qty,
         |  ${Det.sqlAvg("l_extendedprice")} AS avg_price,
         |  ${Det.sqlAvg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_selective_agg" ->
      s"""SELECT ${Det.sqlSum("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q03_join_topk" ->
      s"""SELECT l_orderkey, o_orderdate,
         |  ${Det.sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1999-01-01'
         |  AND l_shipdate > TIMESTAMP '1997-01-01'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q05_broadcast_dims" ->
      s"""SELECT r_name, n_name, ${Det.sqlSum("o_totalprice")} AS total_sales,
         |  COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q09_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey LIMIT 100""".stripMargin,

    "q06_window_rank" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 AND o_custkey <= 200
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q07_window_running" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events WHERE user_id <= 20
        |ORDER BY user_id, event_id""".stripMargin,

    // intersect(C,S) ∪ (C \ S) ≡ distinct(C) — the oracle states the identity.
    "q08_setops" ->
      """SELECT DISTINCT CAST(c_nationkey AS INTEGER) AS nationkey
        |FROM customer ORDER BY nationkey""".stripMargin,

    "q10_rollup" ->
      s"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
         |  ${Det.sqlSum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         |ORDER BY o_orderpriority ASC NULLS FIRST,
         |  o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q67_cube" ->
      s"""SELECT o_orderstatus,
         |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         |  GROUPING(o_orderstatus,
         |    CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER)) AS gid,
         |  COUNT(*) AS n, ${Det.sqlSum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY CUBE (o_orderstatus,
         |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER))
         |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
         |  o_year ASC NULLS FIRST""".stripMargin,

    "q68_pivot" ->
      """SELECT CASE WHEN value < 10 THEN 'low'
        |       WHEN value < 100 THEN 'mid' ELSE 'high' END AS bucket,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'view') AS view,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q11_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    "q12_datetime" ->
      s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS o_month,
         |  COUNT(*) AS n_orders, ${Det.sqlSum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY o_year, o_month
         |ORDER BY o_year, o_month""".stripMargin,

    "q13_case_coalesce" ->
      s"""SELECT event_type,
         |  CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid'
         |       ELSE 'high' END AS bucket,
         |  COUNT(*) AS n,
         |  ${Det.sqlSum("COALESCE(NULLIF(value, 0.0), -1.0)")} AS sum_v
         |FROM events
         |GROUP BY event_type, bucket
         |ORDER BY event_type, bucket""".stripMargin,

    "q14_regexp_json" ->
      s"""SELECT TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INTEGER) % 10
         |    AS k_mod,
         |  COUNT(*) AS n, ${Det.sqlAvg("value")} AS avg_value
         |FROM events
         |GROUP BY k_mod
         |ORDER BY k_mod""".stripMargin,

    "q15_string_funcs" ->
      """SELECT c_custkey, UPPER(c_mktsegment) AS seg_upper,
        |  SUBSTRING(c_name, 1, 8) AS name_prefix,
        |  CAST(LENGTH(c_name) AS INTEGER) AS name_len,
        |  c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR) AS seg_nation
        |FROM customer
        |WHERE c_custkey <= 100
        |ORDER BY c_custkey""".stripMargin
  )
}
