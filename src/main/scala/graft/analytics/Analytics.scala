package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load

/** Reference-parity analytics queries (SURVEY.md §2), re-expressed
  * Spark-first over the driver's testdata star schema using the
  * role mapping in FIXTURES.md §B (customers→customer, products→part,
  * orders→orders, order_items→lineitem, "Completed"→o_orderstatus='F').
  *
  * Every query here is declarative DataFrame DSL: Catalyst handles
  * predicate pushdown, column pruning and join-strategy selection
  * (dims like `part`/`customer` broadcast; the `lineitem` fact streams).
  * Aggregated doubles are rounded to 2dp at the query EDGE only, so the
  * DuckDB oracle (same parquet, same arithmetic) hashes identically.
  *
  * Reference citations are `main.py:line` into /root/reference/.
  */
object Analytics {

  private def r2(c: Column): Column = round(c, 2)

  /** A1 (main.py:648-657): monthly sales — month bucket, order count,
    * revenue over completed orders, chronological order. */
  def monthlySales(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("total_orders"),
           r2(sum(col("o_totalprice"))).as("total_revenue"))
      .orderBy("month")

  /** A2 (main.py:660-669): customer-segment rollup ordered by revenue. */
  def segmentRollup(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")
      .groupBy(col("c_mktsegment").as("customer_segment"))
      .agg(count(lit(1)).as("customer_count"),
           r2(avg(col("c_acctbal"))).as("avg_spent"),
           r2(sum(col("c_acctbal"))).as("total_revenue"))
      .orderBy(desc("total_revenue"), col("customer_segment"))

  /** A3 + J1 + O3 (main.py:672-685): top-10 products by revenue —
    * 3-way join, completed-only, group on the product key (+ its
    * functionally-dependent name/category, resolving SQLite's
    * bare-column GROUP BY), desc sort, limit 10.
    * Scale note: `part` is the small side → Catalyst broadcasts it;
    * the lineitem↔orders join shuffles on the order key only once. */
  def topProducts(s: SparkSession, dir: String): DataFrame = {
    val part = load(s, dir, "part")
    val li = load(s, dir, "lineitem")
    val ord = load(s, dir, "orders").filter(col("o_orderstatus") === "F")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("p_type"))
      .agg(r2(sum(col("l_quantity"))).as("total_sold"),
           r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("total_revenue"))
      .orderBy(desc("total_revenue"), col("p_partkey"))
      .limit(10)
  }

  /** J2 + A4 (main.py:618-628): customer lifetime totals — the
    * correlated-UPDATE decorrelated into agg + left join + fill;
    * customers with no completed orders get (0, 0.0) exactly as the
    * reference's COUNT/COALESCE(SUM,0) does. */
  def customerTotals(s: SparkSession, dir: String): DataFrame = {
    val cust = load(s, dir, "customer")
    val aggs = load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey"))
      .agg(count(col("o_orderkey")).as("cnt"), sum(col("o_totalprice")).as("spent"))
    cust.join(aggs, cust("c_custkey") === aggs("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
              coalesce(col("cnt"), lit(0L)).as("total_orders"),
              r2(coalesce(col("spent"), lit(0.0))).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** A5 (main.py:793-802): per-group quality summary — events stand in
    * for etl_metadata (avg/sum/max per type, desc by avg). Timestamps
    * exported as second-precision strings for cross-engine stability. */
  def qualitySummary(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           r2(avg(col("value"))).as("avg_value"),
           r2(sum(col("value"))).as("total_value"),
           date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen"))
      .orderBy(desc("avg_value"), col("event_type"))

  /** A6 + F9 (main.py:837-845): trailing-24h global metrics. The
    * reference anchors to wall-clock now(); for determinism we anchor
    * to max(ts) — a 1-row broadcast join, no driver collect. */
  def recentMetrics(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val anchor = ev.agg(max(col("ts")).as("mx"))
    ev.join(broadcast(anchor))
      .filter(col("ts") >= col("mx") - expr("INTERVAL 24 HOURS"))
      .agg(count(lit(1)).as("n_events"),
           r2(avg(col("value"))).as("avg_value"),
           r2(sum(col("value"))).as("total_value"))
  }

  /** A7+A8+A9 (main.py:59-64): one-pass data profile — row count,
    * per-column null counts, duplicate-row count — a single aggregate
    * job (the reference makes three pandas passes). */
  def profileCustomer(s: SparkSession, dir: String): DataFrame = {
    val df = load(s, dir, "customer")
    val nullCounts = df.columns.toSeq.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    val distinctRows = count_distinct(struct(df.columns.map(col).toSeq: _*)).as("distinct_rows")
    val aggs = Seq(distinctRows) ++ nullCounts
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .withColumn("dup_rows", col("n_rows") - col("distinct_rows"))
  }

  /** P1+F1 (main.py:428-433): trim every string column, drop rows that
    * are entirely null. Null-preserving trim (deviation from pandas'
    * astype(str) NaN→"nan" bug, documented in SURVEY §7). */
  def cleanCustomer(s: SparkSession, dir: String): DataFrame = {
    val df = load(s, dir, "customer")
    val trimmed = df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType.typeName == "string") d.withColumn(f.name, trim(col(f.name))) else d
    }
    trimmed.na.drop("all").orderBy("c_custkey")
  }

  /** P2 (main.py:443-447): value-map standardization — unmapped values
    * pass through unchanged (chained when/otherwise; a broadcast-join
    * mapping table is the shape at 1000s of mappings). */
  def nationNameMap(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "nation")
      .select(col("n_nationkey"),
        when(col("n_name") === "NATION_0", "ALPHA")
          .when(col("n_name") === "NATION_1", "BETA")
          .when(col("n_name") === "NATION_2", "GAMMA")
          .otherwise(col("n_name")).as("n_name_std"))
      .orderBy("n_nationkey")

  /** P5+F6+F7 (main.py:465,491-497): derived line totals with
    * positivity filters — arithmetic derive at scan, fully codegen'd. */
  def lineTotals(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .filter(col("l_quantity") > 0 && col("l_extendedprice") >= 0)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity"),
              // no edge rounding: the raw IEEE product is bit-identical in
              // any engine, while ROUND(x, 2) on a 4-decimal product is a
              // decimal tie that engines break differently
              (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("line_total"))
      .orderBy("l_orderkey", "l_linenumber")

  /** F8 (main.py:654,681,626): status filter projection. */
  def completedOrders(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
              col("o_totalprice"))
      .orderBy("o_orderkey")

  /** F10-F13 (main.py:877-908): business-rule violation counts as one
    * row — four independent scalar aggregates, cross-joined (all 1-row,
    * so the join is free). */
  def rulesReport(s: SparkSession, dir: String): DataFrame = {
    val future = load(s, dir, "orders")
      .filter(col("o_orderdate") > lit("2001-01-01").cast("timestamp"))
      .agg(count(lit(1)).as("future_orders"))
    val margin = load(s, dir, "part")
      .filter(col("p_retailprice") <= col("p_size"))
      .agg(count(lit(1)).as("margin_violations"))
    val badName = load(s, dir, "customer")
      .filter(!col("c_name").contains("#"))
      .agg(count(lit(1)).as("bad_name_customers"))
    val badQty = load(s, dir, "lineitem")
      .filter(col("l_quantity") <= 0)
      .agg(count(lit(1)).as("nonpositive_qty_items"))
    future.crossJoin(margin).crossJoin(badName).crossJoin(badQty)
  }

  /** Window-function showcase (beyond reference §2.7): top-2 parts by
    * revenue within each brand — rank over a partitioned window. */
  def topPerBrand(s: SparkSession, dir: String): DataFrame = {
    val rev = load(s, dir, "lineitem")
      .join(broadcast(load(s, dir, "part")),
            col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"), col("p_name"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(desc("revenue"), col("p_partkey"))
    rev.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 2)
      .select(col("p_brand"), col("rk"), col("p_partkey"), col("p_name"), col("revenue"))
      .orderBy("p_brand", "rk")
  }

  /** Multi-way star join: revenue per region (region⋈nation⋈customer⋈
    * orders). Dims broadcast; only the orders fact shuffles for the agg. */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = load(s, dir, "region")
    val nation = load(s, dir, "nation")
    val cust = load(s, dir, "customer")
    load(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice"))).as("revenue"))
      .orderBy("r_name")
  }

  /** TPC-H Q1-shaped pricing summary — the flagship scan-heavy
    * aggregation (maps A1's shape onto the full lineitem fact):
    * one pass, partial aggregation map-side, 8 aggregates. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(r2(sum(col("l_quantity"))).as("sum_qty"),
           r2(sum(col("l_extendedprice"))).as("sum_base_price"),
           r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
           r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge"),
           r2(avg(col("l_quantity"))).as("avg_qty"),
           r2(avg(col("l_extendedprice"))).as("avg_price"),
           round(avg(col("l_discount")), 4).as("avg_disc"),
           count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Supplier-side rollup (completes testdata table coverage): per
    * nation, supplier count and account-balance stats; nation dim
    * broadcasts. Left join keeps supplier-less nations with zeros,
    * mirroring J2's empty-group semantics. */
  def supplierBalances(s: SparkSession, dir: String): DataFrame = {
    val nation = load(s, dir, "nation")
    val sup = load(s, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
           r2(sum(col("s_acctbal"))).as("total_balance"),
           r2(avg(col("s_acctbal"))).as("avg_balance"))
    nation.join(sup, nation("n_nationkey") === sup("s_nationkey"), "left")
      .select(col("n_nationkey"), col("n_name"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        r2(coalesce(col("total_balance"), lit(0.0))).as("total_balance"),
        coalesce(col("avg_balance"), lit(0.0)).as("avg_balance"))
      .orderBy("n_nationkey")
  }

  /** Set operations (no reference analog — SURVEY §2.7 records none):
    * customers with finished orders, minus those with open orders,
    * restricted to positive-balance customers. EXCEPT/INTERSECT carry
    * SQL's distinct semantics; Catalyst plans them as distinct +
    * left-anti / left-semi hash joins — each input shuffles once on the
    * 8-byte key, the right shape at any scale. */
  def orderSetOps(s: SparkSession, dir: String): DataFrame = {
    val orders = load(s, dir, "orders")
    val finished = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val open = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val positive = load(s, dir, "customer")
      .filter(col("c_acctbal") > 0).select(col("c_custkey").as("o_custkey"))
    finished.except(open).intersect(positive).orderBy("o_custkey")
  }

  /** Month × order-status matrix via the genuine relational PIVOT
    * (Spark compiles the explicit value list to conditional aggregates
    * in ONE pass — no per-status re-scan; explicit values keep the
    * plan static, a values-inferring pivot would need a distinct
    * pre-query). Counts are integers, so every engine agrees. */
  def statusPivot(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy("month")
      .pivot("o_orderstatus", Seq("P", "O", "F"))
      .agg(count(lit(1)))
      .select(col("month"),
        coalesce(col("P"), lit(0L)).as("n_pending"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_filled"))
      .orderBy("month")

  /** Each nation's share of its region's (filled-order) revenue — the
    * window-aggregate-over-groups idiom. Revenue is converted to
    * integer cents PER ROW (round of a deterministic double product)
    * before any sum, so group and window totals are exact integers in
    * every engine; the share is one division at the edge. All three
    * dims (customer included) broadcast at these scale factors, so the
    * only shuffle keys on the (region, nation) aggregate; at a scale
    * where customer outgrows the broadcast threshold, drop the hint
    * and stats pick a shuffled hash join on o_custkey. */
  def revenueShare(s: SparkSession, dir: String): DataFrame = {
    val nation = load(s, dir, "nation")
    val region = load(s, dir, "region")
    val cust = load(s, dir, "customer")
    val byNation = load(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("rev_cents"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("r_name")
    byNation
      .withColumn("region_cents", sum("rev_cents").over(w))
      .select(col("r_name"), col("n_name"), col("n_orders"), col("rev_cents"),
        round(col("rev_cents").cast("double") / col("region_cents").cast("double"), 4)
          .as("revenue_share"))
      .orderBy("r_name", "n_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_status_pivot" -> statusPivot,
    "q19_revenue_share" -> revenueShare,
    "q17_order_set_ops" -> orderSetOps,
    "q16_supplier_balances" -> supplierBalances,
    "q01_monthly_sales" -> monthlySales,
    "q02_segment_rollup" -> segmentRollup,
    "q03_top_products" -> topProducts,
    "q04_customer_totals" -> customerTotals,
    "q05_quality_summary" -> qualitySummary,
    "q06_recent_metrics" -> recentMetrics,
    "q07_profile_customer" -> profileCustomer,
    "q08_clean_customer" -> cleanCustomer,
    "q09_nation_map" -> nationNameMap,
    "q10_line_totals" -> lineTotals,
    "q11_completed_orders" -> completedOrders,
    "q12_rules_report" -> rulesReport,
    "q13_top_per_brand" -> topPerBrand,
    "q14_region_revenue" -> regionRevenue,
    "q15_pricing_summary" -> pricingSummary)

  /** DuckDB twins of every query above — same parquet, same column
    * names, same rounding, same ordering. */
  val oracles: Map[String, String] = Map(
    "q18_status_pivot" -> """
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
        COUNT(*) FILTER (o_orderstatus = 'P') AS n_pending,
        COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
        COUNT(*) FILTER (o_orderstatus = 'F') AS n_filled
      FROM orders GROUP BY 1 ORDER BY 1""",
    "q19_revenue_share" -> """
      WITH n AS (
        SELECT r.r_name, na.n_name, COUNT(*) AS n_orders,
          CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation na ON c.c_nationkey = na.n_nationkey
        JOIN region r ON na.n_regionkey = r.r_regionkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY 1, 2)
      SELECT r_name, n_name, n_orders, rev_cents,
        ROUND(CAST(rev_cents AS DOUBLE) /
          CAST(SUM(rev_cents) OVER (PARTITION BY r_name) AS DOUBLE), 4) AS revenue_share
      FROM n ORDER BY r_name, n_name""",
    "q17_order_set_ops" -> """
      SELECT * FROM (
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        INTERSECT
        SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal > 0)
      ORDER BY o_custkey""",
    "q16_supplier_balances" ->
      """SELECT n.n_nationkey, n.n_name,
         COALESCE(s.n_suppliers, 0) AS n_suppliers,
         ROUND(COALESCE(s.total_balance, 0), 2) AS total_balance,
         COALESCE(s.avg_balance, 0) AS avg_balance
         FROM nation n LEFT JOIN (
           SELECT s_nationkey, COUNT(*) AS n_suppliers,
             ROUND(SUM(s_acctbal), 2) AS total_balance,
             ROUND(AVG(s_acctbal), 2) AS avg_balance
           FROM supplier GROUP BY 1) s
         ON n.n_nationkey = s.s_nationkey ORDER BY n.n_nationkey""",
    "q01_monthly_sales" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
         COUNT(*) AS total_orders, ROUND(SUM(o_totalprice), 2) AS total_revenue
         FROM orders WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY 1""",
    "q02_segment_rollup" ->
      """SELECT c_mktsegment AS customer_segment, COUNT(*) AS customer_count,
         ROUND(AVG(c_acctbal), 2) AS avg_spent, ROUND(SUM(c_acctbal), 2) AS total_revenue
         FROM customer GROUP BY 1 ORDER BY total_revenue DESC, customer_segment""",
    "q03_top_products" ->
      """SELECT p.p_partkey, p.p_name, p.p_type,
         ROUND(SUM(l.l_quantity), 2) AS total_sold,
         ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         WHERE o.o_orderstatus = 'F'
         GROUP BY 1, 2, 3 ORDER BY total_revenue DESC, p_partkey LIMIT 10""",
    "q04_customer_totals" ->
      """SELECT c.c_custkey, c.c_name,
         COALESCE(o.cnt, 0) AS total_orders, ROUND(COALESCE(o.spent, 0), 2) AS total_spent
         FROM customer c LEFT JOIN (
           SELECT o_custkey, COUNT(o_orderkey) AS cnt, SUM(o_totalprice) AS spent
           FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) o
         ON c.c_custkey = o.o_custkey ORDER BY c.c_custkey""",
    "q05_quality_summary" ->
      """SELECT event_type, COUNT(*) AS n_events,
         ROUND(AVG(value), 2) AS avg_value, ROUND(SUM(value), 2) AS total_value,
         strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
         FROM events GROUP BY 1 ORDER BY avg_value DESC, event_type""",
    "q06_recent_metrics" ->
      """SELECT COUNT(*) AS n_events, ROUND(AVG(value), 2) AS avg_value,
         ROUND(SUM(value), 2) AS total_value
         FROM events WHERE ts >= (SELECT MAX(ts) - INTERVAL 24 HOUR FROM events)""",
    "q07_profile_customer" ->
      """SELECT COUNT(*) AS n_rows,
         COUNT(DISTINCT (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)) AS distinct_rows,
         CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_custkey,
         CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_name,
         CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_nationkey,
         CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_acctbal,
         CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_mktsegment,
         COUNT(*) - COUNT(DISTINCT (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)) AS dup_rows
         FROM customer""",
    "q08_clean_customer" ->
      """SELECT c_custkey, TRIM(c_name) AS c_name, c_nationkey, c_acctbal,
         TRIM(c_mktsegment) AS c_mktsegment
         FROM customer ORDER BY c_custkey""",
    "q09_nation_map" ->
      """SELECT n_nationkey,
         CASE n_name WHEN 'NATION_0' THEN 'ALPHA' WHEN 'NATION_1' THEN 'BETA'
                     WHEN 'NATION_2' THEN 'GAMMA' ELSE n_name END AS n_name_std
         FROM nation ORDER BY n_nationkey""",
    "q10_line_totals" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         l_extendedprice * (1 - l_discount) AS line_total
         FROM lineitem WHERE l_quantity > 0 AND l_extendedprice >= 0
         ORDER BY l_orderkey, l_linenumber""",
    "q11_completed_orders" ->
      """SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         o_totalprice FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""",
    "q12_rules_report" ->
      """SELECT
         (SELECT COUNT(*) FROM orders WHERE o_orderdate > TIMESTAMP '2001-01-01') AS future_orders,
         (SELECT COUNT(*) FROM part WHERE p_retailprice <= p_size) AS margin_violations,
         (SELECT COUNT(*) FROM customer WHERE NOT contains(c_name, '#')) AS bad_name_customers,
         (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) AS nonpositive_qty_items""",
    "q13_top_per_brand" ->
      """SELECT p_brand, rk, p_partkey, p_name, revenue FROM (
           SELECT p.p_brand, p.p_partkey, p.p_name,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             ROW_NUMBER() OVER (PARTITION BY p.p_brand
               ORDER BY ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) DESC, p.p_partkey) AS rk
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2, 3)
         WHERE rk <= 2 ORDER BY p_brand, rk""",
    "q14_region_revenue" ->
      """SELECT r.r_name, COUNT(*) AS n_orders, ROUND(SUM(o.o_totalprice), 2) AS revenue
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE o.o_orderstatus = 'F' GROUP BY 1 ORDER BY 1""",
    "q15_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
         ROUND(AVG(l_quantity), 2) AS avg_qty,
         ROUND(AVG(l_extendedprice), 2) AS avg_price,
         ROUND(AVG(l_discount), 4) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
         GROUP BY 1, 2 ORDER BY 1, 2""")
}
