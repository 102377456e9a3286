package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator surface over the driver's TPC-H-ish parquet tables.
  *
  * The reference's MapReduce model (`/root/reference/src/mr/worker.go:39`) can
  * express all of these as (map, reduce) pairs — tag-and-join, group-aggregate,
  * distinct — but ships no relational app. Here they are declared with the
  * DataFrame API so Catalyst plans them: filters and projections push into the
  * parquet scan, small dimension tables broadcast, and aggregates run
  * partial → final (map-side combine) — all properties the reference engine
  * lacks (SURVEY.md §4.1) and that matter at 100 TB.
  *
  * Numeric policy for oracle parity: every money aggregate is computed in
  * exact integer cents (`round(x*100)::bigint`), summed as a 64-bit integer
  * (order-independent, overflow-safe to ~9e16 cents), and divided by 100.0
  * once at the end. The resulting double is bit-identical in any engine, so
  * results hash-match DuckDB regardless of aggregation order — raw
  * floating-point sums would not.
  */
object RelationalQueries {

  /** `round(col*100)` as exact integer cents. */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("bigint")

  /** TPC-H Q1 shape: pricing summary over lineitem (filter → groupBy → agg).
    * Scan-level: only 7 of 11 lineitem columns are read; the shipdate
    * predicate pushes into the parquet scan. Partial aggregation means each
    * of the 32 (or 1000) input partitions ships at most
    * |returnflag×linestatus| rows through the shuffle. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  def q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_base_price,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: three-way join with selective filters, top-10 revenue.
    * customer is filtered then broadcast (1/5 of an already-small dim);
    * orders⋈lineitem shuffles on the join key, which AQE sizes at runtime.
    * Ties at the limit boundary are broken by l_orderkey so the top-k set is
    * deterministic. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(graft.Plans.broadcastIfSmallStats(cust, s"q3/cust/$dir"), col("o_custkey") === col("c_custkey"))
      // order_date as a calendar string: timestamp columns round-trip with
      // engine-specific precisions; a date string is representation-stable.
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def q3ShippingSql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1, 2
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: revenue by nation for one region's suppliers.
    * region(5)⋈nation(25)⋈supplier(tiny) all broadcast into the lineitem
    * scan — one shuffle total (the final groupBy), no sort-merge of a fact
    * table against a 5-row dim. */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(dims, s"q5/dims/$dir"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  def q5NationRevenueSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin

  /** Top spenders: aggregate the fact table FIRST (150k orders → 15k groups),
    * then join the small aggregate against customer. Aggregating before the
    * join keeps the shuffle proportional to |customers|, not |orders|. */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total_spend"))
    spend.join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_orders"), col("total_spend"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(20)
  }

  def topCustomersSql: String =
    """SELECT c_custkey, c_name, n_orders, total_spend FROM (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total_spend
      |  FROM orders GROUP BY o_custkey) s
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_spend DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q4 shape: left-semi join (EXISTS) — orders with at least one
    * line item shipped after the order date, counted by priority. The semi
    * join short-circuits per key; no lineitem columns survive the join. */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  def orderPrioritySql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** Per-brand part statistics — column-pruned scan (4 of 6 columns). */
  def partBrandStats(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        (sum(cents(col("p_retailprice"))) / 100.0).as("total_retail"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"))

  def partBrandStatsSql: String =
    """SELECT p_brand, count(*) AS n_parts,
      |  CAST(sum(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total_retail,
      |  min(p_size) AS min_size, max(p_size) AS max_size
      |FROM part GROUP BY p_brand""".stripMargin

  /** Distinct — partial dedup on the map side, tiny shuffle. */
  def distinctSegments(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_mktsegment")).distinct()

  def distinctSegmentsSql: String =
    "SELECT DISTINCT c_mktsegment FROM customer"

  /** Global top-k without a global sort: Spark's TakeOrderedAndProject takes
    * k per partition and merges — O(n) scan, no full shuffle-sort. */
  def lineitemTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)

  def lineitemTopkSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 25""".stripMargin

  /** Customer balances rolled up to nation — broadcast dim join. Average is
    * derived from the exact integer sum and count (single IEEE division) so
    * it is reproducible across engines and partitionings. */
  def nationBalance(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"), sum(cents(col("c_acctbal"))).as("bal_cents"))
    cust.join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("n_name"),
        col("n_customers"),
        (col("bal_cents") / 100.0).as("total_acctbal"),
        (col("bal_cents") / col("n_customers") / 100.0).as("avg_acctbal"))
  }

  def nationBalanceSql: String =
    """SELECT n_name, n_customers,
      |  bal_cents/100.0 AS total_acctbal,
      |  bal_cents/n_customers/100.0 AS avg_acctbal
      |FROM (
      |  SELECT c_nationkey, count(*) AS n_customers,
      |    CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
      |  FROM customer GROUP BY c_nationkey) s
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  /** Set operation: union of two filtered order populations, then distinct
    * count by status — exercises unionAll + distinct aggregation. */
  def unionOrderStatus(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val big = ord.filter(col("o_totalprice") > 400000.0)
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
    big.unionAll(urgent)
      .select(col("o_orderkey"), col("o_orderstatus")).distinct()
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q6 shape: pure scan-filter-aggregate, the pushdown showcase —
    * every predicate reaches the parquet reader, one row comes back per
    * partition. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
      .agg(
        (sum(cents(col("l_extendedprice")) * cents(col("l_discount"))) / 10000.0).as("revenue"),
        count(lit(1)).as("n_items"))

  def q6ForecastSql: String =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT)/10000.0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Grouping sets via ROLLUP. Subtotal rows are marked 'ALL' via
    * `grouping(col)` — the grouping-set indicator — not by COALESCE-ing the
    * rolled-up NULL, so a genuine NULL dimension value can never be
    * conflated with a subtotal row. */
  def ordersRollup(spark: SparkSession, dir: String): DataFrame =
    // Dataset-native rollup — the earlier spark.sql formulation registered
    // a fixed-name temp view (`orders_v`), a session-global side effect and
    // collision hazard a registered query must not have.
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        // grouping() only resolves while the grouping-set metadata exists,
        // i.e. inside this agg — not in a downstream select
        when(grouping(col("o_orderstatus")) === 1, lit("ALL"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(grouping(col("o_orderpriority")) === 1, lit("ALL"))
          .otherwise(col("o_orderpriority")).as("priority"),
        count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("bigint")) / 100.0).as("total_price"))
      .select(col("status"), col("priority"), col("n_orders"), col("total_price"))

  def ordersRollupSql: String =
    """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
      |       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** Full grouping-sets sibling of [[ordersRollup]]: CUBE adds the
    * priority-only marginal the rollup lacks (4 grouping sets vs 3). Same
    * one-shuffle partial-agg plan — Spark expands the sets map-side. */
  def ordersCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        when(grouping(col("o_orderstatus")) === 1, lit("ALL"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(grouping(col("o_orderpriority")) === 1, lit("ALL"))
          .otherwise(col("o_orderpriority")).as("priority"),
        count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("bigint")) / 100.0).as("total_price"))
      .select(col("status"), col("priority"), col("n_orders"), col("total_price"))

  def ordersCubeSql: String =
    """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
      |       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Range join: line items classified into literal price bands via a
    * non-equi join against a broadcast 3-row band table. At a scale where
    * the band side stayed small this plan (broadcast nested-loop) is
    * exactly right; with a large band table the rewrite is binning to an
    * equi-join key, which `events_hourly`-style bucketing demonstrates. */
  def priceBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 20000.0),
      ("mid", 20000.0, 50000.0),
      ("high", 50000.0, 1e12)).toDF("band", "lo", "hi")
    Tables.lineitem(spark, dir)
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("total_price"))
  }

  def priceBandsSql: String =
    """SELECT band, count(*) AS n_items,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total_price
      |FROM lineitem
      |JOIN (VALUES ('low', 0.0, 20000.0),
      |             ('mid', 20000.0, 50000.0),
      |             ('high', 50000.0, 1e12)) b(band, lo, hi)
      |  ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band""".stripMargin

  /** INTERSECT / EXCEPT: customers active in both 1996 and 1997, minus the
    * BUILDING segment — the remaining set-operation surface. */
  def customerSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def activeIn(year: Int) = ord
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("o_custkey"))
    activeIn(1996).intersect(activeIn(1997)).except(building)
      .select(col("o_custkey").as("custkey"))
  }

  def customerSetOpsSql: String =
    """SELECT o_custkey AS custkey FROM (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  INTERSECT
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  EXCEPT
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') s""".stripMargin

  /** Anti join (NOT EXISTS): customers that never placed an urgent order,
    * per segment. The filter pushes into the orders scan before the
    * left_anti, which ships only the join key and short-circuits per match. */
  def customersNoOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), min(col("c_custkey")).as("min_custkey"))

  def customersNoOrdersSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers, min(c_custkey) AS min_custkey
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin

  /** Argmin per group (the Q2 access pattern without a partsupp table): the
    * cheapest shipped line item of each brand, as `min(struct(...))` —
    * lexicographic struct-min IS the argmin with its tie-break chain
    * (price, orderkey, linenumber), and unlike a rank-1 window it aggregates
    * partially on the map side: no per-brand sort of the fact table, one
    * |brands|-row shuffle after a broadcast join against `part`. */
  def brandCheapest(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")), s"brandCheapest/part/$dir"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(min(struct(
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"), col("l_suppkey")))
        .as("m"))
      .select(col("p_brand"), col("m.l_orderkey").as("l_orderkey"),
        col("m.l_linenumber").as("l_linenumber"), col("m.l_suppkey").as("l_suppkey"),
        col("m.l_extendedprice").as("l_extendedprice"))

  def brandCheapestSql: String =
    """SELECT p_brand, l_orderkey, l_linenumber, l_suppkey, l_extendedprice FROM (
      |  SELECT p_brand, l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
      |    row_number() OVER (PARTITION BY p_brand
      |                       ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem JOIN part ON l_partkey = p_partkey) t
      |WHERE rn = 1""".stripMargin

  /** Scalar subquery: orders above the global average price. The comparison
    * stays in exact integers — `cents·n > Σcents` — so no floating-point
    * average ever exists to diverge; the 1-row aggregate broadcasts. */
  def ordersAboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val tot = ord.agg(
      sum(cents(col("o_totalprice"))).as("sum_cents"),
      count(lit(1)).as("n_all"))
    ord.crossJoin(broadcast(tot))
      .filter(cents(col("o_totalprice")) * col("n_all") > col("sum_cents"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total_price"))
  }

  def ordersAboveAvgSql: String =
    """WITH t AS (
      |  SELECT CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |         count(*) AS n_all
      |  FROM orders)
      |SELECT o_orderstatus, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total_price
      |FROM orders, t
      |WHERE CAST(round(o_totalprice*100) AS BIGINT) * n_all > sum_cents
      |GROUP BY o_orderstatus""".stripMargin

  /** Exact second-moment statistics — variance, stddev, and the
    * quantity↔discount correlation per return flag — from integer-cents
    * power sums (Σx, Σx², Σxy as bigints, one shuffle, partial-agg
    * friendly). Every intermediate is exact, the scale factors cancel in
    * corr, and the final double expressions are evaluated identically by any
    * engine — unlike built-in `stddev`/`corr`, whose running-moment updates
    * depend on partition order. Bigint power sums hold to ~1e18; beyond
    * that (true 100 TB row counts) the same sums lower to DECIMAL(38,0). */
  def lineitemStats(spark: SparkSession, dir: String): DataFrame = {
    val qc = cents(col("l_quantity"))
    val dc = cents(col("l_discount"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(qc).as("sx"), sum(qc * qc).as("sxx"),
        sum(dc).as("sy"), sum(dc * dc).as("syy"),
        sum(qc * dc).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        (col("sx").cast("double") / col("n").cast("double") / 100.0).as("avg_qty"),
        // explicit degenerate-group guards (n<2, zero variance): Spark's
        // divide-by-zero yields NULL while DuckDB's yields inf/NaN, so the
        // undefined cases must be NULL by construction in BOTH engines
        when(col("n") >= 2,
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            / (col("n") * (col("n") - 1)).cast("double") / 10000.0).as("var_qty"),
        when(col("n") >= 2,
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            / (col("n") * (col("n") - 1)).cast("double") / 10000.0)).as("std_qty"),
        when(col("n") >= 2 &&
            col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("n") * col("syy") - col("sy") * col("sy") > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("corr_qty_disc"))
  }

  def lineitemStatsSql: String =
    """SELECT l_returnflag, n,
      |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS avg_qty,
      |  CASE WHEN n >= 2 THEN
      |    CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 END AS var_qty,
      |  CASE WHEN n >= 2 THEN
      |    sqrt(CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0) END AS std_qty,
      |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
      |    CAST(n*sxy - sx*sy AS DOUBLE)
      |      / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END AS corr_qty_disc
      |FROM (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(qc) AS BIGINT) AS sx, CAST(sum(qc*qc) AS BIGINT) AS sxx,
      |    CAST(sum(dc) AS BIGINT) AS sy, CAST(sum(dc*dc) AS BIGINT) AS syy,
      |    CAST(sum(qc*dc) AS BIGINT) AS sxy
      |  FROM (SELECT l_returnflag,
      |          CAST(round(l_quantity*100) AS BIGINT) AS qc,
      |          CAST(round(l_discount*100) AS BIGINT) AS dc
      |        FROM lineitem) c
      |  GROUP BY l_returnflag) s""".stripMargin

  /** Exact median price per return flag, computed as a two-phase distributed
    * selection rather than a per-group global sort: (1) histogram the prices
    * into $1000 integer-cent buckets — a partial-aggregable groupBy whose
    * output is |groups|·|buckets|, tiny; (2) a cumulative count over that
    * tiny histogram locates the bucket(s) holding the middle position(s);
    * (3) only rows in those buckets (a ~1/|buckets| sliver of the data, via
    * broadcast join) enter a row_number window, offset by the preceding
    * buckets' cumulative count to recover the global rank. A naive
    * `row_number() OVER (PARTITION BY l_returnflag ORDER BY price)` sorts
    * the whole fact table with parallelism = |groups| (3 here) — this shape
    * keeps every fact-table pass narrow or partially aggregated at any
    * scale. The middle one or two values are averaged in integer cents, the
    * same deterministic element choice the oracle makes. */
  def medianPrice(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("pc"))
      .withColumn("bkt", expr("pc div 100000"))
    // (1) tiny histogram + per-group totals
    val hist = base.groupBy(col("l_returnflag"), col("bkt"))
      .agg(count(lit(1)).as("bc"))
    val wb = Window.partitionBy(col("l_returnflag")).orderBy(col("bkt"))
    // (2) candidate buckets: those overlapping either middle position
    val cand = hist
      .withColumn("cum_before",
        coalesce(sum(col("bc")).over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("bc")).over(Window.partitionBy(col("l_returnflag"))))
      .filter(expr("cum_before < (n + 2) div 2 AND cum_before + bc >= (n + 1) div 2"))
      .select(col("l_returnflag"), col("bkt"), col("cum_before"), col("n"))
    // (3) rank only inside candidate buckets; global rank = offset + local
    val offsets = cand.groupBy(col("l_returnflag"))
      .agg(min(col("cum_before")).as("offset"), max(col("n")).as("n"))
    val wr = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("pc"), col("l_orderkey"), col("l_linenumber"))
    base.join(broadcast(cand.select(col("l_returnflag"), col("bkt"))), Seq("l_returnflag", "bkt"))
      .join(broadcast(offsets), Seq("l_returnflag"))
      .withColumn("rn", row_number().over(wr) + col("offset"))
      .filter(expr("rn = (n + 1) div 2 OR rn = (n + 2) div 2"))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("n")).as("n"),
        (sum(col("pc")).cast("double") / count(lit(1)).cast("double") / 100.0)
          .as("median_price"))
  }

  def medianPriceSql: String =
    """SELECT l_returnflag, max(n) AS n,
      |  CAST(sum(pc) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 AS median_price
      |FROM (
      |  SELECT l_returnflag, n, CAST(round(l_extendedprice*100) AS BIGINT) AS pc
      |  FROM (
      |    SELECT l_returnflag, l_extendedprice,
      |      row_number() OVER (PARTITION BY l_returnflag
      |                         ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
      |      count(*) OVER (PARTITION BY l_returnflag) AS n
      |    FROM lineitem) r
      |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2) p
      |GROUP BY l_returnflag""".stripMargin

  /** TPC-H Q12 shape (no l_shipmode in this schema, so priority classes
    * stand in): conditional CASE-sums per ship month — one scan-side
    * projection, one partially-aggregated shuffle. */
  def q12PriorityClass(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_lines"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_lines"))

  def q12PriorityClassSql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** TPC-H Q14 shape: promo revenue share — two exact cent sums, one final
    * double division (the ratio is engine-exact because both operands are). */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val disc = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(Tables.part(spark, dir).select(col("p_partkey"), col("p_type")), s"q14/part/$dir"),
        col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc).otherwise(0L)).as("pc"),
        sum(disc).as("tc"))
      .select(
        (col("pc") / 10000.0).as("promo_revenue"),
        (col("tc") / 10000.0).as("total_revenue"),
        (col("pc").cast("double") / col("tc").cast("double") * 100.0).as("promo_pct"))
  }

  def q14PromoShareSql: String =
    """SELECT pc/10000.0 AS promo_revenue, tc/10000.0 AS total_revenue,
      |  CAST(pc AS DOUBLE) / CAST(tc AS DOUBLE) * 100.0 AS promo_pct
      |FROM (
      |  SELECT
      |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN d ELSE 0 END) AS BIGINT) AS pc,
      |    CAST(sum(d) AS BIGINT) AS tc
      |  FROM (
      |    SELECT p_type,
      |      CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) AS d
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00') x) s""".stripMargin

  /** TPC-H Q19 shape: disjunctive AND-clusters (OR of three conjunct
    * groups) over the join — the predicate-pushdown stress case; revenue in
    * exact cents. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_type"), col("p_size")), s"q19/part/$dir"),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_type") === "PROMO" && col("l_quantity") >= 1 && col("l_quantity") <= 20) ||
          (col("p_type") === "ECONOMY" && col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
          (col("p_size") >= 40 && col("l_quantity") < 15))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
          .as("revenue"))

  def q19DisjunctiveSql: String =
    """SELECT count(*) AS n_items,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_type = 'PROMO' AND l_quantity >= 1 AND l_quantity <= 20)
      |   OR (p_type = 'ECONOMY' AND l_quantity >= 10 AND l_quantity <= 30)
      |   OR (p_size >= 40 AND l_quantity < 15)""".stripMargin

  /** TPC-H Q17 shape: small-quantity outliers vs each part's own average —
    * a correlated aggregate, decorrelated into a per-part power-sum join.
    * The `qty < avg/5` comparison is kept in exact integers
    * (`5·qc·n < Σqc`), so no floating-point average exists to diverge. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(cents(col("l_quantity"))).as("sx"), count(lit(1)).as("n"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(cents(col("l_quantity")) * 5L * col("n") < col("sx"))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("total_price"))
  }

  def q17SmallQuantitySql: String =
    """SELECT count(*) AS n_items,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total_price
      |FROM lineitem
      |JOIN (SELECT l_partkey AS pk,
      |        CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sx,
      |        count(*) AS n
      |      FROM lineitem GROUP BY l_partkey) p ON l_partkey = pk
      |WHERE CAST(round(l_quantity*100) AS BIGINT) * 5 * n < sx""".stripMargin

  /** Exact type-1 quantiles (p25/p50/p75/p99: the element at rank
    * `max(1, ceil(q·n))`) per return flag, in ONE pass of the two-phase
    * selection that [[medianPrice]] introduced: the same $1000-bucket
    * histogram locates every quantile's bucket at once, and only those
    * buckets' rows are ranked (per (group, quantile) window over a sliver,
    * offset by the histogram's cumulative count). Exact order statistics at
    * any scale without ever sorting the fact table globally. `q·n` and
    * `ceil` are evaluated identically by both engines, so the picked
    * element is deterministic. */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = Seq(0.25, 0.5, 0.75, 0.99)
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("pc"))
      .withColumn("bkt", expr("pc div 100000"))
    val hist = base.groupBy(col("l_returnflag"), col("bkt"))
      .agg(count(lit(1)).as("bc"))
    val wb = Window.partitionBy(col("l_returnflag")).orderBy(col("bkt"))
    val cum = hist
      .withColumn("cum_before",
        coalesce(sum(col("bc")).over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("bc")).over(Window.partitionBy(col("l_returnflag"))))
    // one row per (group, quantile): the global rank to pick + its bucket
    val cand = cum
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("r", greatest(lit(1L), ceil(col("q") * col("n")).cast("bigint")))
      .filter(col("cum_before") < col("r") && col("cum_before") + col("bc") >= col("r"))
      .select(col("l_returnflag"), col("q"), col("bkt"), col("cum_before"), col("r"))
    val wr = Window.partitionBy(col("l_returnflag"), col("q"))
      .orderBy(col("pc"), col("l_orderkey"), col("l_linenumber"))
    base.join(broadcast(cand), Seq("l_returnflag", "bkt"))
      .withColumn("rn", row_number().over(wr) + col("cum_before"))
      .filter(col("rn") === col("r"))
      .select(col("l_returnflag"), col("q"), (col("pc") / 100.0).as("value"))
  }

  def priceQuantilesSql: String =
    """SELECT l_returnflag, q, pc/100.0 AS value
      |FROM (
      |  SELECT l_returnflag, pc,
      |    row_number() OVER (PARTITION BY l_returnflag
      |                       ORDER BY pc, l_orderkey, l_linenumber) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
      |          CAST(round(l_extendedprice*100) AS BIGINT) AS pc
      |        FROM lineitem) c) r
      |JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.99]::DOUBLE[]) AS q) qs
      |  ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))""".stripMargin

  /** Date arithmetic: shipping lag in whole days (`datediff` — exact
    * integers) aggregated per priority; the average is the one final
    * division over exact integer sums. */
  def shippingLag(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("bigint").as("lag_days"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        min(col("lag_days")).as("min_lag"),
        max(col("lag_days")).as("max_lag"),
        (sum(col("lag_days")).cast("double") / count(lit(1)).cast("double")).as("avg_lag"))

  def shippingLagSql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  min(lag_days) AS min_lag, max(lag_days) AS max_lag,
      |  CAST(sum(lag_days) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_lag
      |FROM (
      |  SELECT o_orderpriority,
      |    CAST(date_diff('day', o_orderdate::DATE, l_shipdate::DATE) AS BIGINT) AS lag_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
      |GROUP BY o_orderpriority""".stripMargin

  /** Unpivot (stack): three measure columns rotated into (metric, value)
    * rows — a narrow 1→3 expansion ahead of one partial-aggregated shuffle. */
  def lineitemUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(expr(
        """stack(3,
          |  'qty',   l_quantity,
          |  'price', l_extendedprice,
          |  'disc',  l_discount) AS (metric, value)""".stripMargin))
      .groupBy(col("metric"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("bigint")) / 100.0).as("total"))

  def lineitemUnpivotSql: String =
    """SELECT metric, count(*) AS n,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)/100.0 AS total
      |FROM (
      |  SELECT 'qty' AS metric, l_quantity AS value FROM lineitem
      |  UNION ALL SELECT 'price', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'disc', l_discount FROM lineitem) u
      |GROUP BY metric""".stripMargin

  /** Correlated scalar subquery through the SQL API — Catalyst decorrelates
    * it into an aggregate + (broadcast) join; `max` is order-free so the
    * value is engine-exact.
    *
    * The SQL surface needs named relations, but session-global view names
    * would be a side effect (and a collision hazard for a long-lived
    * multi-tenant session), so the views are registered under query-unique
    * names and dropped as soon as the statement is analyzed — `spark.sql`
    * resolves eagerly, so the returned (lazy) DataFrame keeps its resolved
    * relations and executes fine after the drop. */
  def customerMaxOrder(spark: SparkSession, dir: String): DataFrame = {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val customerV = s"graft_customer_$tag"
    val ordersV = s"graft_orders_$tag"
    Tables.customer(spark, dir).createOrReplaceTempView(customerV)
    Tables.orders(spark, dir).createOrReplaceTempView(ordersV)
    try spark.sql(
      s"""SELECT c_custkey, c_name,
         |  (SELECT max(o_totalprice) FROM $ordersV WHERE o_custkey = c_custkey) AS max_order
         |FROM $customerV
         |WHERE c_acctbal > 9000""".stripMargin)
    finally {
      spark.catalog.dropTempView(customerV)
      spark.catalog.dropTempView(ordersV)
    }
  }

  def customerMaxOrderSql: String =
    """SELECT c_custkey, c_name,
      |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
      |FROM customer
      |WHERE c_acctbal > 9000""".stripMargin

  /** LATERAL correlated TABLE subquery — the SQL-surface member the scalar
    * subqueries above don't witness: the inner relation is re-evaluated
    * per outer row (top-2 customers per nation), which Catalyst
    * decorrelates through its LateralJoin rewrite instead of looping.
    * Ordering is on exact cents (then name) so the cut is a total order in
    * both engines. Same transient-view hygiene as [[customerMaxOrder]]. */
  def nationTopTwoLateral(spark: SparkSession, dir: String): DataFrame = {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val nationV = s"graft_nation_$tag"
    val customerV = s"graft_customer_$tag"
    Tables.nation(spark, dir).createOrReplaceTempView(nationV)
    Tables.customer(spark, dir).createOrReplaceTempView(customerV)
    try spark.sql(
      s"""SELECT n.n_name, c.c_name,
         |  CAST(round(c.c_acctbal * 100) AS BIGINT) AS acct_cents
         |FROM $nationV n,
         |LATERAL (
         |  SELECT c_name, c_acctbal FROM $customerV
         |  WHERE c_nationkey = n.n_nationkey
         |  ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_name
         |  LIMIT 2
         |) c""".stripMargin)
    finally {
      spark.catalog.dropTempView(nationV)
      spark.catalog.dropTempView(customerV)
    }
  }

  def nationTopTwoLateralSql: String =
    """SELECT n.n_name, c.c_name,
      |  CAST(round(c.c_acctbal * 100) AS BIGINT) AS acct_cents
      |FROM nation n,
      |LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_name
      |  LIMIT 2
      |) c""".stripMargin

  def unionOrderStatusSql: String =
    """SELECT o_orderstatus, count(*) AS n_orders FROM (
      |  SELECT DISTINCT o_orderkey, o_orderstatus FROM (
      |    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000.0
      |    UNION ALL
      |    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT') u) d
      |GROUP BY o_orderstatus""".stripMargin

  /** TPC-H Q4 shape — EXISTS decorrelated to a left-semi join: orders in a
    * date window counted per priority when at least one of their line items
    * was returned. The semi join shuffles both sides on the order key and
    * keeps no payload from the inner side — the shape `IN`/`EXISTS`
    * subqueries should always lower to. */
  def q4ExistsReturned(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o_orderkey"))
    o.join(returned, Seq("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  def q4ExistsReturnedSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape — customer order-count distribution via LEFT OUTER
    * join: zero-order customers must appear (the outer join's whole
    * point), so the histogram's 0 bucket is real. Two partial-agg keyed
    * shuffles; `count(o_orderkey)` counts matches only (nulls excluded),
    * exactly the semantics both engines share. */
  def q13OrderHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))

  def q13OrderHistogramSql: String =
    """SELECT n_orders, count(*) AS n_customers
      |FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) per_cust
      |GROUP BY n_orders""".stripMargin

  /** TPC-H Q18 shape — large-quantity orders: the HAVING subquery becomes
    * an aggregate → semi join; quantity sums are exact integer hundredths
    * (doubles like 25.5 are representable, but the SUM must not be an IEEE
    * fold — policy rule 8). */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_quantity"))).as("qty_c"))
      .filter(col("qty_c") > 300 * 100L)
    Tables.orders(spark, dir)
      .join(big.select(col("l_orderkey").as("o_orderkey"), col("qty_c")), "o_orderkey")
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        (col("qty_c") / 100.0).as("total_qty"),
        cents(col("o_totalprice")).as("price_c"))
      .select(col("c_name"), col("o_orderkey"), col("total_qty"),
        (col("price_c") / 100.0).as("o_totalprice"))
  }

  def q18LargeOrdersSql: String =
    """SELECT c_name, o_orderkey, qty_c / 100.0 AS total_qty,
      |  CAST(round(o_totalprice*100) AS BIGINT) / 100.0 AS o_totalprice
      |FROM (SELECT l_orderkey,
      |        CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING qty_c > 30000) big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** TPC-H Q22 shape — idle wealthy customers: above-average balance with
    * no RECENT order (none since 2000-01-01; every synthetic customer has
    * some lifetime order), grouped by nation. The average is compared in
    * EXACT integer arithmetic (`cents * n > sum_cents` instead of a
    * double-vs-double threshold), so the selected set cannot flip on an
    * IEEE rounding difference between engines; the anti join is the NOT
    * EXISTS lowering, with the recency filter pushed below it into the
    * orders scan. */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), cents(col("c_acctbal")).as("bal_c"))
    val avgSide = c.filter(col("bal_c") > 0)
      .agg(sum(col("bal_c")).as("sum_c"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey").as("c_custkey"))
    c.crossJoin(broadcast(avgSide))
      .filter(col("bal_c") * col("n_pos") > col("sum_c"))
      .join(recent, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        (sum(col("bal_c")) / 100.0).as("total_bal"))
  }

  /** TPC-H Q10 shape — returned-item customer ranking: who cost us the
    * most in returns last year. Four-way join (lineitem⋈orders shuffled on
    * the order key; customer and nation broadcast), exact-cents discounted
    * revenue, top 20 via TakeOrderedAndProject with a total tie-break. */
  def q10ReturnedRanking(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("rev"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    l.join(o, "l_orderkey")
      .groupBy(col("o_custkey"))
      .agg((sum(col("rev")) / 10000.0).as("revenue"))
      .join(graft.Plans.broadcastIfSmallStats(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_nationkey")), s"q10/cust/$dir"), "o_custkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))), "c_nationkey")
      .select(col("o_custkey").as("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  def q10ReturnedRankingSql: String =
    """SELECT o_custkey AS c_custkey, c_name, n_name, revenue
      |FROM (SELECT o_custkey,
      |        CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |          * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0
      |          AS revenue
      |      FROM lineitem
      |      JOIN orders ON l_orderkey = o_orderkey
      |      WHERE l_returnflag = 'R'
      |        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      |      GROUP BY o_custkey) r
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON n_nationkey = c_nationkey
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  /** TPC-H Q7 shape — cross-nation trade volume: revenue shipped between
    * two nations in either direction, by year. Both nation sides resolve
    * through broadcast dimension joins into the fact shuffle
    * (supplier→n1 onto lineitem, customer→n2 onto orders); the disjunctive
    * pair predicate applies after both names are in scope, exactly where
    * Catalyst can't push it lower. */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    // The classic Q7 rewrite: restrict BOTH dimension sides to the two
    // nations of interest BEFORE they touch a fact table — the inner joins
    // then shrink orders and lineitem to the ~2/25 relevant slice, and only
    // the cheap disjunctive pair test remains on top (eliminating the
    // same-nation combinations). Filtering after the fact join instead
    // forces the full lineitem⋈orders shuffle — PlanQualitySuite catches
    // that as a sort-merge join of unfiltered facts.
    val n = Tables.nation(spark, dir).filter(col("n_name").isin("NATION_1", "NATION_2"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(supp, s"q7/supp/$dir"), col("l_suppkey") === col("s_suppkey"))
      // the supp broadcast already thinned lineitem to the 2-nation slice;
      // the orders side joins as a raw scan (statically broadcast at this
      // sf, a keyed shuffle join at cluster scale — same shape as q3) and
      // the cust broadcast then acts as the customer-nation filter
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Plans.broadcastIfSmallStats(cust, s"q7/cust/$dir"), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
          .as("revenue"))
  }

  def q7NationVolumeSql: String =
    """SELECT supp_nation, cust_nation, l_year, count(*) AS n_items,
      |  CAST(sum(price_c * (100 - disc_c)) AS BIGINT)/10000.0 AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS l_year,
      |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
      |    CAST(round(l_discount*100) AS BIGINT) AS disc_c
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) v
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q15 shape — top supplier(s) by shipped revenue in a window: a
    * max-of-aggregates, answered without a window function by broadcasting
    * the one-row maximum back onto the per-supplier aggregate. Exact cents
    * make the `revenue = max` equality safe — the very comparison Q15's
    * view formulation requires and IEEE sums would break. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2000-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("rev_c"))
    val top = rev.agg(max(col("rev_c")).as("max_c"))
    rev.crossJoin(broadcast(top))
      .filter(col("rev_c") === col("max_c"))
      .join(graft.Plans.broadcastIfSmallStats(Tables.supplier(spark, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_name")), s"q15/supp/$dir"), "l_suppkey")
      .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
        (col("rev_c") / 10000.0).as("total_revenue"))
  }

  def q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT l_suppkey AS s_suppkey, s_name, rev_c / 10000.0 AS total_revenue
      |FROM rev JOIN supplier ON s_suppkey = l_suppkey
      |WHERE rev_c = (SELECT max(rev_c) FROM rev)""".stripMargin

  def q22IdleCustomersSql: String =
    """WITH c AS (SELECT c_custkey, c_nationkey,
      |             CAST(round(c_acctbal*100) AS BIGINT) AS bal_c
      |           FROM customer),
      |a AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, count(*) AS n_pos
      |      FROM c WHERE bal_c > 0)
      |SELECT c_nationkey, count(*) AS n_cust,
      |  CAST(sum(bal_c) AS BIGINT) / 100.0 AS total_bal
      |FROM c, a
      |WHERE bal_c * n_pos > sum_c
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey""".stripMargin

  /** TPC-H Q21 shape — suppliers who kept orders waiting: the hardest
    * classic decorrelation (EXISTS + NOT EXISTS over the SAME fact table,
    * both correlated on the order key). Q21's two correlated subqueries
    * ("another supplier participated" / "no other supplier failed") lower
    * into ONE aggregated per-order supplier profile — distinct suppliers,
    * distinct failing suppliers, and (exactly when there is one) THE
    * failing supplier, all from a single lineitem scan and one keyed
    * shuffle — instead of the three fact scans of the literal form. The
    * schema has no receipt/commit dates, so "failed" is `l_returnflag='R'`;
    * supplier nation is restricted to one region like the spec's one
    * nation, via broadcast dimension joins. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    // Two-level aggregation instead of a double countDistinct: the
    // countDistinct form Expands every lineitem row 3× before the shuffle
    // (one replica per distinct-aggregate plus one for the plain ones —
    // measured 2.5 s vs 0.9 s at sf0.1); collapsing to (order, supplier)
    // first keeps the fact shuffle at 1× and makes the second aggregate a
    // plain count/sum over the already-tiny per-supplier profile.
    val perSupplier = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("bad"))
    val profile = perSupplier
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("bad")).as("n_bad"),
        max(when(col("bad") === 1, col("l_suppkey"))).as("bad_supp"))
      // EXISTS other-supplier ∧ NOT EXISTS other-failing-supplier, in
      // aggregate form: multi-supplier order whose failures all trace to
      // one supplier — bad_supp, well-defined exactly because n_bad = 1
      .filter(col("n_supp") > 1 && col("n_bad") === 1)
    val fOrders = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val asiaSuppliers = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    profile
      .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(graft.Plans.broadcastIfSmallStats(asiaSuppliers, s"q21/asiaSupp/$dir"), col("bad_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  def q21WaitingSuppliersSql: String =
    """WITH profile AS (
      |  SELECT l_orderkey,
      |    count(DISTINCT l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_bad,
      |    max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS bad_supp
      |  FROM lineitem GROUP BY 1),
      |sole AS (
      |  SELECT p.bad_supp
      |  FROM profile p JOIN orders o ON p.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F' AND p.n_supp > 1 AND p.n_bad = 1)
      |SELECT s_name, count(*) AS numwait
      |FROM sole
      |JOIN supplier ON bad_supp = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY s_name""".stripMargin

  /** TPC-H Q2 shape — minimum-cost supplier: a correlated scalar min
    * ACROSS A JOIN (the spec's `ps_supplycost = (SELECT min … WHERE
    * supplier in region)`), decorrelated into a per-part min aggregate
    * joined back on cost equality. The schema has no partsupp, so supply
    * cost is the minimum unit price ever quoted on a line item — exact
    * integer cents divided by the integral quantity, the same IEEE double
    * in both engines, which is what makes the `unit_cost = min` equality
    * join safe. Dimension chain (part type filter, supplier → nation →
    * region) broadcasts; the fact shuffles once for the per-part min. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val eurSuppliers = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    val supply = Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(promoParts, s"q2/parts/$dir"), col("l_partkey") === col("p_partkey"))
      .join(graft.Plans.broadcastIfSmallStats(eurSuppliers, s"q2/supp/$dir"), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("s_name"),
        col("n_name"), col("s_acctbal"),
        (cents(col("l_extendedprice")) / col("l_quantity")).as("unit_cost"))
    // `best` derives from `supply` — rename its key so the back-join isn't
    // an ambiguous self-join reference. It is ≤ one row per qualifying
    // part (dimension-sized, not fact-sized), so the promoParts gate
    // decision is a free conservative upper bound: if the part dimension
    // fits a broadcast, so does the narrower per-part aggregate; past the
    // threshold the same equality join runs shuffled-hash on its keys.
    val best = supply.groupBy(col("p_partkey")).agg(min(col("unit_cost")).as("cost"))
      .select(col("p_partkey").as("best_partkey"), col("cost"))
    val bestHinted =
      if (graft.Plans.statsFitsBroadcast(promoParts, s"q2/parts/$dir")) broadcast(best)
      else best.hint("shuffle_hash")
    supply
      .join(bestHinted,
        col("p_partkey") === col("best_partkey") && col("unit_cost") === col("cost"))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("s_name"),
        col("n_name"), col("s_acctbal"), col("cost"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("p_partkey"))
      .limit(100)
  }

  def q2MinCostSupplierSql: String =
    """WITH supply AS (
      |  SELECT p_partkey, p_brand, p_type, s_name, n_name, s_acctbal,
      |    CAST(round(l_extendedprice*100) AS BIGINT) / l_quantity AS unit_cost
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
      |best AS (SELECT p_partkey, min(unit_cost) AS cost FROM supply GROUP BY 1)
      |SELECT DISTINCT s.p_partkey, p_brand, p_type, s_name, n_name, s_acctbal, cost
      |FROM supply s JOIN best b ON s.p_partkey = b.p_partkey AND s.unit_cost = b.cost
      |ORDER BY s_acctbal DESC, s.p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q20 shape — the subquery-in-subquery semi-join chain: suppliers
    * IN (flows over parts IN (part predicate) exceeding an aggregate
    * threshold). The innermost part predicate becomes a broadcast semi-join
    * into the fact scan (with the date filter pushed to parquet); the
    * aggregate subquery lowers to ONE keyed shuffle on (part, supplier);
    * the outer IN becomes a semi-join onto supplier. The schema has no
    * partsupp availability, so the threshold is an absolute 1997 volume
    * (> 50 units of one promo part — above any single line's quantity, so
    * only genuinely repeated flows qualify). */
  def q20ConcentratedSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val flows = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(graft.Plans.broadcastIfSmallStats(promoParts, s"q20/parts/$dir"), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("bigint").as("q97"))
      .filter(col("q97") > 50)
    Tables.supplier(spark, dir)
      .join(flows.select(col("l_suppkey")).distinct(),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
  }

  /** TPC-H Q8 shape — national market share: of all revenue flowing to one
    * region's customers, the fraction supplied by one nation, per year. The
    * share is a ratio of two EXACT integer-scaled sums (a conditional sum
    * over the same rows as the total — one pass, no second scan), divided
    * once at the end: engine-identical doubles. Customer region and
    * supplier nation resolve through broadcast dimension chains; the only
    * fact-fact join is lineitem⋈orders on the order key. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val amerCust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val nationRev = sum(when(col("supp_nation") === "NATION_5", col("rev")).otherwise(0L))
    // thin orders by the customer-region semi-join BEFORE the fact-fact
    // join — the region keeps ~1/5 of orders, so the lineitem⋈orders
    // shuffle moves a fifth of the rows (and the thinned side broadcasts
    // at this sf; at cluster scale it stays a keyed shuffle join)
    val amerOrders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      // customer is a dimension: broadcast the semi side explicitly (the
      // static planner over-estimates the joined-dimension size and would
      // fall back to a sort-merge semi join)
      .join(graft.Plans.broadcastIfSmallStats(amerCust, s"q8/amerCust/$dir"), col("o_custkey") === col("c_custkey"), "left_semi")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("rev"))
      .join(amerOrders, col("l_orderkey") === col("o_orderkey"))
      .join(graft.Plans.broadcastIfSmallStats(supp, s"q8/supp/$dir"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        nationRev.cast("bigint").as("nation_rev_scaled"),
        sum(col("rev")).cast("bigint").as("total_rev_scaled"),
        (nationRev.cast("double") / sum(col("rev")).cast("double")).as("mkt_share"))
  }

  def q8MarketShareSql: String =
    """WITH cust AS (
      |  SELECT c_custkey FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'AMERICA'),
      |flat AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, n_name AS supp_nation,
      |    CAST(round(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN cust ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey)
      |SELECT o_year,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev ELSE 0 END) AS BIGINT) AS nation_rev_scaled,
      |  CAST(sum(rev) AS BIGINT) AS total_rev_scaled,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(rev) AS DOUBLE) AS mkt_share
      |FROM flat GROUP BY 1""".stripMargin

  /** TPC-H Q9 shape — product-type profit by supplier nation and year.
    * The schema has no partsupp supply cost, so cost is half the part's
    * retail price per unit — kept EXACT by scaling everything to 10⁻⁴
    * dollars (revenue = cents × basis-points; cost = cents × qty × 50)
    * before one final division. Part and supplier→nation sides broadcast;
    * lineitem⋈orders is the one fact shuffle. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val mediumParts = Tables.part(spark, dir).filter(col("p_type") === "MEDIUM")
      .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_c"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(mediumParts, s"q9/parts/$dir"), col("l_partkey") === col("p_partkey"))
      .join(graft.Plans.broadcastIfSmallStats(supp, s"q9/supp/$dir"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("nation"), year(col("o_orderdate")).as("o_year"),
        (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
          - col("retail_c") * col("l_quantity").cast("bigint") * lit(50L)).as("amount"))
      .groupBy(col("nation"), col("o_year"))
      .agg(
        (sum(col("amount")).cast("bigint") / 10000.0).as("profit"),
        count(lit(1)).as("n_items"))
  }

  def q9ProductProfitSql: String =
    """WITH flat AS (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(round(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(round(l_discount*100) AS BIGINT))
      |      - CAST(round(p_retailprice*100) AS BIGINT)
      |        * CAST(l_quantity AS BIGINT) * 50 AS amount
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey AND p_type = 'MEDIUM'
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey)
      |SELECT nation, o_year,
      |  CAST(sum(amount) AS BIGINT)/10000.0 AS profit,
      |  count(*) AS n_items
      |FROM flat GROUP BY 1, 2""".stripMargin

  /** TPC-H Q11 shape — important flows: per-part supply value restricted to
    * one region's suppliers, kept only when it exceeds a FRACTION of the
    * global total (the scalar-aggregate HAVING). The fraction test is exact
    * integer arithmetic (`value · 1000 > total`, no float threshold); the
    * one-row total broadcasts back onto the per-part aggregate, and the
    * region's supplier set broadcasts into the fact scan as a semi join.
    * partsupp doesn't exist here, so "value" is shipped price × quantity. */
  def q11ImportantFlows(spark: SparkSession, dir: String): DataFrame = {
    val asiaSuppliers = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val flows = Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(asiaSuppliers, s"q11/asiaSupp/$dir"), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice")) * col("l_quantity").cast("bigint"))
        .cast("bigint").as("value_scaled"))
    val total = flows.agg(sum(col("value_scaled")).cast("bigint").as("t"))
    flows.crossJoin(broadcast(total))
      .filter(col("value_scaled") * 1000L > col("t"))
      .select(col("l_partkey"), col("value_scaled"))
  }

  def q11ImportantFlowsSql: String =
    """WITH flows AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_scaled
      |  FROM lineitem
      |  WHERE l_suppkey IN (
      |    SELECT s_suppkey FROM supplier
      |    JOIN nation ON s_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |    WHERE r_name = 'ASIA')
      |  GROUP BY 1),
      |total AS (SELECT CAST(sum(value_scaled) AS BIGINT) AS t FROM flows)
      |SELECT l_partkey, value_scaled
      |FROM flows, total
      |WHERE value_scaled * 1000 > t""".stripMargin

  /** TPC-H Q16 shape — supplier counts per part attribute with the NOT IN
    * exclusion subquery: distinct suppliers per (brand, type) over larger
    * parts, excluding a supplier denylist. The exclusion lowers to a
    * broadcast anti join (the denylist is dimension-sized and provably
    * null-free, so NOT IN ≡ anti join); the distinct count is one keyed
    * shuffle. */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 500.0)
      .select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(Tables.part(spark, dir).filter(col("p_size") >= 25)
        .select(col("p_partkey"), col("p_brand"), col("p_type")), s"q16/part/$dir"),
        col("l_partkey") === col("p_partkey"))
      .join(graft.Plans.broadcastIfSmallStats(excluded, s"q16/excluded/$dir"), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  def q16SupplierCountsSql: String =
    """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_size >= 25
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
      |GROUP BY 1, 2""".stripMargin

  /** FULL OUTER join — the reconciliation shape the outer-join family was
    * missing (q13 is left outer): per nation, the building-segment customer
    * book against the wealthy-supplier book, keeping nations present on
    * EITHER side with the other side zero-filled and flagged. Both inputs
    * are already aggregated (≤ |nations| rows), so the full outer join is
    * dimension-sized regardless of fact scale. */
  def nationReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("c_nationkey").as("c_nation"))
      .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("cust_bal_c"))
    val s = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 5000.0)
      .groupBy(col("s_nationkey").as("s_nation"))
      .agg(count(lit(1)).as("n_supp"), sum(cents(col("s_acctbal"))).as("supp_bal_c"))
    // a FULL outer join can't broadcast (both sides are outer); the
    // shuffled-hash hint avoids sorting two already-tiny aggregates
    c.hint("shuffle_hash").join(s, col("c_nation") === col("s_nation"), "full_outer")
      .select(
        coalesce(col("c_nation"), col("s_nation")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        (coalesce(col("cust_bal_c"), lit(0L)) / 100.0).as("cust_bal"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        (coalesce(col("supp_bal_c"), lit(0L)) / 100.0).as("supp_bal"),
        (col("c_nation").isNull || col("s_nation").isNull).as("one_sided"))
  }

  def nationReconciliationSql: String =
    """WITH c AS (
      |  SELECT c_nationkey AS nationkey, count(*) AS n_cust,
      |    CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS cust_bal_c
      |  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
      |s AS (
      |  SELECT s_nationkey AS nationkey, count(*) AS n_supp,
      |    CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS BIGINT) AS supp_bal_c
      |  FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
      |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust,
      |  COALESCE(cust_bal_c, 0)/100.0 AS cust_bal,
      |  COALESCE(n_supp, 0) AS n_supp,
      |  COALESCE(supp_bal_c, 0)/100.0 AS supp_bal,
      |  (c.nationkey IS NULL OR s.nationkey IS NULL) AS one_sided
      |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey""".stripMargin

  def q20ConcentratedSuppliersSql: String =
    """WITH flows AS (
      |  SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS q97
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2
      |  HAVING CAST(sum(l_quantity) AS BIGINT) > 50)
      |SELECT s_suppkey, s_name, s_acctbal, n_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (SELECT l_suppkey FROM flows)""".stripMargin

  /** Incremental view maintenance of the Q1 pricing summary: the base
    * partition (90% of lineitem) is aggregated once, the delta partition
    * (10%) separately, and the published summary is the MERGE of the two
    * partial aggregates — sums add, counts add, averages derive from the
    * merged sums. The oracle recomputes from scratch over all rows, so
    * the hash-compare IS the algebraic-mergeability proof.
    *
    * This is the pattern that turns a 100 TB nightly rescan into a
    * delta-sized update: the base aggregate is a stored table (here the
    * base branch of the plan); only the delta ever shuffles. Works for
    * any commutative-monoid aggregate — exactly the reference's
    * commutative-reduce lowering condition (SURVEY §2.1 F7), surfaced as
    * a user-level maintenance pattern. */
  def pricingIncremental(spark: SparkSession, dir: String): DataFrame = {
    def partialAgg(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents(col("l_quantity"))).as("sq"),
        sum(cents(col("l_extendedprice"))).as("sp"))
    val li = Tables.lineitem(spark, dir)
    val base  = partialAgg(li.filter(pmod(col("l_orderkey"), lit(10)) =!= 0))
    val delta = partialAgg(li.filter(pmod(col("l_orderkey"), lit(10)) === 0))
    base.unionAll(delta)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n")).as("n"), sum(col("sq")).as("sq"), sum(col("sp")).as("sp"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("n"),
        (col("sq") / 100.0).as("sum_qty"),
        (col("sp") / 100.0).as("sum_price"),
        (col("sq").cast("double") / col("n").cast("double") / 100.0).as("avg_qty"))
  }

  def pricingIncrementalSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price,
      |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) / 100.0 AS avg_qty
      |FROM lineitem
      |GROUP BY 1, 2""".stripMargin

  /** Skyline (Pareto frontier) of parts: minimize price, maximize size —
    * the preference-query operator family (Börzsönyi et al., "The Skyline
    * Operator", ICDE 2001). A (price, size) point survives iff no other
    * point has price ≤ AND size ≥ with one strict.
    *
    * Computed WITHOUT the quadratic NOT-EXISTS self-join: on DISTINCT
    * (price, size) pairs ordered by (price asc, size desc), a pair is on
    * the frontier iff its size exceeds the running max size of all
    * preceding pairs — every preceding pair has smaller price, or equal
    * price and (distinct ⇒ strictly) larger size, so "preceding with
    * size ≥ mine" is exactly "dominates me". The oracle runs the identical
    * window formulation; equivalence to the textbook NOT-EXISTS definition
    * is pinned by a suite test at sf0.001.
    *
    * Scale shape: the distinct is one partial-agg shuffle; the frontier
    * pass here is a single window over the distinct PAIRS (price-cardinality
    * sized, not row-count sized). If even the distinct-pair set outgrew one
    * partition, the same pass runs per-bucket first — local dominance
    * implies global dominance, so pruning per bucket then re-running on the
    * (tiny) survivor union is exact; the pair set here is far below that
    * threshold, so the plan keeps the single sort. */
  def partSkyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.part(spark, dir)
      .groupBy(cents(col("p_retailprice")).as("price_cents"),
        col("p_size").cast("bigint").as("p_size"))
      .agg(count(lit(1)).as("n_parts"))
    val w = Window.orderBy(col("price_cents").asc, col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pairs
      .withColumn("best_before", max(col("p_size")).over(w))
      .filter(col("best_before").isNull || col("p_size") > col("best_before"))
      .select(col("price_cents"), col("p_size"), col("n_parts"))
  }

  def partSkylineSql: String =
    """WITH pairs AS (
      |  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
      |    CAST(p_size AS BIGINT) AS p_size, count(*) AS n_parts
      |  FROM part GROUP BY 1, 2),
      |marked AS (
      |  SELECT *, max(p_size) OVER (ORDER BY price_cents ASC, p_size DESC
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    AS best_before
      |  FROM pairs)
      |SELECT price_cents, p_size, n_parts
      |FROM marked WHERE best_before IS NULL OR p_size > best_before""".stripMargin

  /** Table profiling (the ANALYZE / data-quality pass): one row per column
    * of `orders` with row count, null count, exact distinct count, and
    * typed min/max — numeric columns (timestamps as epoch seconds) in
    * `min_num`/`max_num`, string columns in `min_str`/`max_str`.
    *
    * Profiling must touch every cell by definition, so the scalable shape
    * is about SHUFFLE volume, not scan volume: the table unpivots once to
    * (column, value) cells — a narrow explode, no wide row ever shuffles —
    * then (a) per-column stats as ONE partial-agg shuffle whose reduce side
    * is |columns| rows, and (b) exact distincts as a two-level aggregation
    * (groupBy (column, value) partial, then per-column count) — the
    * classic re-aggregation that avoids Spark's multi-`count(distinct)`
    * Expand, which would multiply the SCAN by |columns| instead of the
    * cells. At 1000 executors both shuffles are (column, distinct-value)-
    * bounded, orders of magnitude below the cell count on real data.
    *
    * Exactness: counts are integers; min/max are exact values (epoch
    * seconds of midnight-dated timestamps are integral doubles); no
    * approximation anywhere, so the oracle compare is a hash match. */
  def ordersProfile(spark: SparkSession, dir: String): DataFrame = {
    val numeric = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strings = Seq("o_orderstatus", "o_orderpriority")
    val cellStructs =
      numeric.map(c => struct(lit(c).as("col_name"),
        col(c).cast("double").as("num_value"),
        lit(null).cast("string").as("str_value"))) ++
      Seq(struct(lit("o_orderdate").as("col_name"),
        unix_seconds(col("o_orderdate").cast("timestamp")).cast("double").as("num_value"),
        lit(null).cast("string").as("str_value"))) ++
      strings.map(c => struct(lit(c).as("col_name"),
        lit(null).cast("double").as("num_value"),
        col(c).as("str_value")))
    val cells = Tables.orders(spark, dir)
      .select(explode(array(cellStructs: _*)).as("c"))
      .select(col("c.col_name"), col("c.num_value"), col("c.str_value"))
    val stats = cells
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("num_value").isNull && col("str_value").isNull, 1L)
          .otherwise(0L)).as("n_null"),
        min(col("num_value")).as("min_num"),
        max(col("num_value")).as("max_num"),
        min(col("str_value")).as("min_str"),
        max(col("str_value")).as("max_str"))
    val distincts = cells
      .filter(col("num_value").isNotNull || col("str_value").isNotNull)
      .groupBy(col("col_name"), col("num_value"), col("str_value"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"))
    stats.join(distincts, "col_name").orderBy(col("col_name"))
  }

  /** Order-independent table digests — the cross-replica integrity check
    * (anti-entropy): two engines (or two copies of 100 TB) can compare a
    * table without moving rows by exchanging one digest each. Each row
    * canonicalizes to a '|'-joined string of integer-exact fields (money in
    * cents, dates as ISO strings), hashes to a 60-bit md5 prefix, and the
    * table digest is both the XOR and a modular SUM of those hashes — both
    * commutative/associative, so ANY partitioning and merge order yields
    * the identical digest. Two digests, two failure modes covered: XOR is
    * blind to duplicated-row PAIRS, the modular sum is not; the sum alone
    * could miss a swap that XOR catches at different multiplicities. The
    * sum is mod 1e9 per term, so int64 holds to ~9·10⁹ rows per partition
    * aggregate — beyond that, lower to DECIMAL(38,0) like the moment sums. */
  def tableDigest(spark: SparkSession, dir: String): DataFrame = {
    def digestOf(df: DataFrame, name: String, canonical: org.apache.spark.sql.Column) = {
      val h = expr("cast(conv(substring(md5(canon), 1, 15), 16, 10) as bigint)")
      df.select(canonical.as("canon"))
        .select(h.as("h"))
        .agg(
          count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("digest_xor"),
          sum(pmod(col("h"), lit(1000000000L))).as("digest_sum"))
        .select(lit(name).as("table_name"), col("n_rows"),
          col("digest_xor"), col("digest_sum"))
    }
    val li = digestOf(Tables.lineitem(spark, dir), "lineitem",
      concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        cents(col("l_quantity")), cents(col("l_extendedprice")),
        cents(col("l_discount")), cents(col("l_tax")),
        col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate").cast("date").cast("string")))
    val ord = digestOf(Tables.orders(spark, dir), "orders",
      concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        cents(col("o_totalprice")),
        col("o_orderdate").cast("date").cast("string"), col("o_orderpriority")))
    li.unionAll(ord).orderBy(col("table_name"))
  }

  def tableDigestSql: String =
    """WITH li AS (
      |  SELECT 'lineitem' AS table_name, count(*)::BIGINT AS n_rows,
      |    bit_xor(h)::BIGINT AS digest_xor, sum(h % 1000000000)::BIGINT AS digest_sum
      |  FROM (SELECT ('0x' || substr(md5(concat_ws('|',
      |      l_orderkey, l_partkey, l_suppkey, l_linenumber,
      |      CAST(round(l_quantity*100) AS BIGINT), CAST(round(l_extendedprice*100) AS BIGINT),
      |      CAST(round(l_discount*100) AS BIGINT), CAST(round(l_tax*100) AS BIGINT),
      |      l_returnflag, l_linestatus, l_shipdate::DATE::VARCHAR)), 1, 15))::BIGINT AS h
      |    FROM lineitem) t),
      |ord AS (
      |  SELECT 'orders' AS table_name, count(*)::BIGINT AS n_rows,
      |    bit_xor(h)::BIGINT AS digest_xor, sum(h % 1000000000)::BIGINT AS digest_sum
      |  FROM (SELECT ('0x' || substr(md5(concat_ws('|',
      |      o_orderkey, o_custkey, o_orderstatus,
      |      CAST(round(o_totalprice*100) AS BIGINT),
      |      o_orderdate::DATE::VARCHAR, o_orderpriority)), 1, 15))::BIGINT AS h
      |    FROM orders) t)
      |SELECT * FROM li UNION ALL SELECT * FROM ord ORDER BY table_name""".stripMargin

  /** Z-order (Morton) clustering of parts on (size, price): interleave the
    * bits of the two dimensions so range-partitioning on ONE key yields
    * files that are tight BOXES in BOTH — the lakehouse data-clustering
    * technique that makes min/max file skipping work for multi-dimensional
    * predicates. The registered query reports, per z-range, the box each
    * range occupies (count + min/max of both dims): tight, shrinking boxes
    * are the clustering property itself, hash-checked against the oracle;
    * SinkSuite proves the file-skipping consequence on disk.
    *
    * Pure integer bit arithmetic end to end (an `aggregate` fold over bit
    * positions — the same shape both engines evaluate identically), so the
    * oracle is exact. */
  private[graft] def partWithZval(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size").cast("bigint").as("sz"),
        expr("cast(round(p_retailprice * 100) as bigint) div 16").as("pb"))
    // data-derived bounds (broadcast 1-row, the resample-spine pattern):
    // each dimension normalizes to 10 bits so both contribute equally to
    // the curve regardless of their raw ranges — fixed constants would
    // silently collapse the boxes if the generator's domains moved
    val bounds = base.agg(
      min(col("sz")).as("szmin"), max(col("sz")).as("szmax"),
      min(col("pb")).as("pbmin"), max(col("pb")).as("pbmax"))
    base.crossJoin(broadcast(bounds))
      .withColumn("szn",
        expr("(sz - szmin) * 1023 div greatest(szmax - szmin, 1)"))
      .withColumn("pbn",
        expr("(pb - pbmin) * 1023 div greatest(pbmax - pbmin, 1)"))
      .withColumn("zval", expr(
        """aggregate(sequence(0, 9), 0L, (acc, i) ->
          |  acc | shiftleft(shiftright(szn, i) & 1L, 2*i)
          |      | shiftleft(shiftright(pbn, i) & 1L, 2*i + 1))""".stripMargin))
      .drop("szmin", "szmax", "pbmin", "pbmax", "szn", "pbn")
  }

  def partZorder(spark: SparkSession, dir: String): DataFrame =
    partWithZval(spark, dir)
      .withColumn("zbucket", expr("zval div 65536"))
      .groupBy(col("zbucket"))
      .agg(
        count(lit(1)).as("n_parts"),
        min(col("sz")).as("min_size"), max(col("sz")).as("max_size"),
        min(col("pb")).as("min_pb"), max(col("pb")).as("max_pb"))
      .orderBy(col("zbucket"))

  def partZorderSql: String =
    """WITH d AS (
      |  SELECT CAST(p_size AS BIGINT) AS sz,
      |         CAST(round(p_retailprice*100) AS BIGINT) // 16 AS pb
      |  FROM part),
      |b AS (
      |  SELECT min(sz) AS szmin, max(sz) AS szmax,
      |         min(pb) AS pbmin, max(pb) AS pbmax FROM d),
      |z AS (
      |  SELECT sz, pb,
      |    list_reduce(list_prepend(0, range(0, 10)), (acc, i) ->
      |      acc | (((szn >> i) & 1) << (2*i)) | (((pbn >> i) & 1) << (2*i + 1))) AS zval
      |  FROM (SELECT sz, pb,
      |          (sz - szmin) * 1023 // greatest(szmax - szmin, 1) AS szn,
      |          (pb - pbmin) * 1023 // greatest(pbmax - pbmin, 1) AS pbn
      |        FROM d CROSS JOIN b) n)
      |SELECT zval // 65536 AS zbucket, count(*)::BIGINT AS n_parts,
      |  min(sz)::BIGINT AS min_size, max(sz)::BIGINT AS max_size,
      |  min(pb)::BIGINT AS min_pb, max(pb)::BIGINT AS max_pb
      |FROM z
      |GROUP BY zbucket ORDER BY zbucket""".stripMargin

  def ordersProfileSql: String = {
    def numBlock(c: String, numExpr: String) =
      s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
         |  (count(*) - count($c))::BIGINT AS n_null,
         |  min($numExpr)::DOUBLE AS min_num, max($numExpr)::DOUBLE AS max_num,
         |  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str,
         |  count(DISTINCT $c)::BIGINT AS n_distinct
         |FROM orders""".stripMargin
    def strBlock(c: String) =
      s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
         |  (count(*) - count($c))::BIGINT AS n_null,
         |  NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num,
         |  min($c) AS min_str, max($c) AS max_str,
         |  count(DISTINCT $c)::BIGINT AS n_distinct
         |FROM orders""".stripMargin
    val blocks =
      Seq("o_orderkey", "o_custkey", "o_totalprice").map(c => numBlock(c, c)) ++
      Seq(numBlock("o_orderdate", "epoch(o_orderdate)")) ++
      Seq("o_orderstatus", "o_orderpriority").map(strBlock)
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Share-of-parent reporting (ratio-to-report) — each nation's revenue
    * as an exact-ppm share of its region AND of the world, in one pass:
    * the two-level percent-of-total every BI layer reports. Shares are
    * integer `cents·10⁶ div parent_cents` (one floor division per level),
    * and the region/world totals roll up FROM the nation aggregate — the
    * corpus is scanned once.
    *
    * Scale: one custkey→nation keyed fact agg, then |nations|-row window
    * sums over region and the 1-row world total broadcast — everything
    * after the fact agg is dimension-sized. */
  def nationRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
    rev
      .withColumn("region_cents", sum(col("cents")).over(Window.partitionBy(col("r_name"))))
      .withColumn("world_cents", sum(col("cents")).over(Window.partitionBy(lit(1))))
      .select(col("r_name"), col("n_name"), col("cents"),
        expr("cents * 1000000L div region_cents").as("share_of_region_ppm"),
        expr("cents * 1000000L div world_cents").as("share_of_world_ppm"))
  }

  def nationRevenueShareSql: String =
    """WITH rev AS (
      |  SELECT r_name, n_name,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2)
      |SELECT r_name, n_name, cents,
      |  CAST(cents * 1000000 // sum(cents) OVER (PARTITION BY r_name) AS BIGINT) AS share_of_region_ppm,
      |  CAST(cents * 1000000 // sum(cents) OVER () AS BIGINT) AS share_of_world_ppm
      |FROM rev""".stripMargin

  /** Herfindahl–Hirschman concentration index of supplier revenue per
    * region — the regulator's market-concentration number (Σ shareᵢ²;
    * 10 000-point scale: < 1 500 competitive, > 2 500 concentrated),
    * joining the Gini and share operators as the squared-share member of
    * the concentration family. Exact: the numerator Σ cᵢ² sums losslessly
    * in decimal(38,0) (cᵢ² overflows int64 at real revenue scales) and
    * ONE floor division lands the index — `(Σ cᵢ²)·10⁴ div S²` — rather
    * than summing per-supplier floored shares, which would leak up to
    * |suppliers| points.
    *
    * Scale: one (region, supplier)-keyed fact agg (dimension chains
    * broadcast), then a |regions|-row reduction; decimal(38,0) carries
    * cᵢ² safely past int64 at any revenue scale. */
  def regionSupplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .join(graft.Plans.broadcastIfSmallStats(Tables.supplier(spark, dir), s"hhi/supp/$dir"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("s_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("bigint")).as("cents"))
    rev.groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("cents")).as("total_cents"),
        sum(col("cents").cast("decimal(38,0)") * col("cents").cast("decimal(38,0)")).as("sum_sq"))
      .select(col("r_name"), col("n_suppliers"), col("total_cents"),
        expr("""cast((sum_sq * 10000) div
               |  (cast(total_cents as decimal(38,0)) * cast(total_cents as decimal(38,0))) as bigint)"""
          .stripMargin).as("hhi_points"))
  }

  def regionSupplierHhiSql: String =
    """WITH rev AS (
      |  SELECT r_name, s_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2)
      |SELECT r_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST((sum(CAST(cents AS HUGEINT) * cents) * 10000)
      |    // (CAST(sum(cents) AS HUGEINT) * sum(cents)) AS BIGINT) AS hhi_points
      |FROM rev GROUP BY r_name""".stripMargin

  /** ABC / Pareto classification of parts by revenue — A = the head that
    * carries the first 80% of revenue, B = the next 15%, C = the tail:
    * the inventory-analysis classifier, decided on EXACT integers
    * (`cum·100 ≤ 80·total` — no float share ever computed). Ties in
    * revenue order break by part id, so the running total — and with it
    * every class boundary — is a total-order scan in both engines.
    *
    * Scale: one partkey-keyed fact agg; the rank/cumsum window runs over
    * the |parts|-sized aggregate (dimension-scale, not fact-scale); output
    * is 3 rows. */
  def partAbcClass(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("bigint")).as("cents"))
    val w = Window.orderBy(col("cents").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("cum", sum(col("cents")).over(w))
      .withColumn("total", sum(col("cents")).over(Window.partitionBy(lit(1))))
      .withColumn("clazz",
        when(col("cum") * 100 <= col("total") * 80, "A")
          .when(col("cum") * 100 <= col("total") * 95, "B")
          .otherwise("C"))
      .groupBy(col("clazz"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"))
  }

  def partAbcClassSql: String =
    """WITH rev AS (
      |  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT cents,
      |    sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
      |                     ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(cents) OVER () AS total
      |  FROM rev)
      |SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
      |            WHEN cum * 100 <= total * 95 THEN 'B'
      |            ELSE 'C' END AS clazz,
      |  CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(cents) AS BIGINT) AS cents
      |FROM c GROUP BY 1""".stripMargin

  /** Gini coefficient of customer-revenue concentration per nation — the
    * inequality readout ("is this market a few whales or a broad base?")
    * in EXACT parts-per-million: with per-customer revenues x₍ᵢ₎ sorted
    * ascending (ties by customer id), `G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) /
    * (n·Σx)` — integer numerator and denominator, one floor division.
    * Zero-order customers count with x = 0 (excluding them would
    * understate inequality). Numerator sign: Σ i·x ≥ ((n+1)/2)·Σx by the
    * rearrangement inequality, so the quotient is non-negative and
    * truncation ≡ floor in both engines. The final ppm arithmetic runs in
    * DECIMAL(38,0) (HUGEINT in the oracle): `2·Σi·x·10⁶` exceeds int64
    * already at sf0.1's per-nation revenue mass — caught by the sf0.1
    * cross-check, ANSI mode turned the silent wrap into an error.
    *
    * Scale shape: revenue is one custkey-keyed partial agg; the rank and
    * the three sums run in per-nation windows sharing one exchange; the
    * final division is |nations|-row arithmetic. */
  def nationRevenueGini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
    val perCust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(rev.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey"), col("c_custkey"),
        coalesce(col("cents"), lit(0L)).as("x"))
    val byNation = Window.partitionBy(col("c_nationkey"))
    perCust
      .withColumn("i", row_number().over(byNation.orderBy(col("x"), col("c_custkey"))).cast("bigint"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("x")).as("total_cents"),
        sum(col("i") * col("x")).as("sum_ix"))
      .filter(col("total_cents") > 0)
      .select(col("c_nationkey").cast("bigint").as("nation_key"),
        col("n_customers"), col("total_cents"),
        expr("""cast((2 * cast(sum_ix as decimal(38,0))
               |      - (n_customers + 1) * cast(total_cents as decimal(38,0))) * 1000000
               |     div (n_customers * cast(total_cents as decimal(38,0))) as bigint)"""
          .stripMargin).as("gini_ppm"))
      .withColumn("gini", round(col("gini_ppm") / 1000000.0, 6))
  }

  def nationRevenueGiniSql: String =
    """WITH rev AS (
      |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |pc AS (
      |  SELECT c.c_nationkey, c.c_custkey, CAST(coalesce(rev.cents, 0) AS BIGINT) AS x
      |  FROM customer c LEFT JOIN rev ON rev.o_custkey = c.c_custkey),
      |rk AS (
      |  SELECT c_nationkey, x,
      |    CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY x, c_custkey) AS BIGINT) AS i
      |  FROM pc)
      |SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(x) AS BIGINT) AS total_cents,
      |  CAST((2 * CAST(sum(i * x) AS HUGEINT) - (count(*) + 1) * CAST(sum(x) AS HUGEINT)) * 1000000
      |    // (count(*) * CAST(sum(x) AS HUGEINT)) AS BIGINT) AS gini_ppm,
      |  round(CAST((2 * CAST(sum(i * x) AS HUGEINT) - (count(*) + 1) * CAST(sum(x) AS HUGEINT)) * 1000000
      |    // (count(*) * CAST(sum(x) AS HUGEINT)) AS BIGINT) / 1000000.0e0, 6) AS gini
      |FROM rk GROUP BY c_nationkey
      |HAVING sum(x) > 0""".stripMargin

  /** Header↔detail reconciliation audit — does each order's stored total
    * agree with the sum of its line extended prices? The row-level
    * integrity join every warehouse runs nightly ([[nationReconciliation]]
    * reconciles two AGGREGATE books; this audits key-by-key), reported per
    * status: orphans (no lines at all), under/over-billed counts, the
    * worst absolute discrepancy and the signed net — all in exact cents,
    * so a one-cent drift is a hit, not a float rounding ghost.
    *
    * Scale shape: the detail side collapses to (orderkey, cents) by ONE
    * partial agg before the join, so the fact⋈fact join carries 16-byte
    * rows; shuffle-hash hinted (aggregate-derived side has no stats —
    * Catalyst would sort-merge); final rollup is |status|-sized. */
  def ordersReconcileLines(spark: SparkSession, dir: String): DataFrame = {
    val lineSums = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("bigint")).as("line_cents"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("bigint").as("o_cents"))
      .join(lineSums.hint("shuffle_hash"),
        col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("diff", col("o_cents") - col("line_cents"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("line_cents").isNull, 1L).otherwise(0L)).as("n_orphan"),
        sum(when(col("diff") < 0, 1L).otherwise(0L)).as("n_underbilled"),
        sum(when(col("diff") > 0, 1L).otherwise(0L)).as("n_overbilled"),
        max(abs(col("diff"))).as("max_abs_diff_cents"),
        sum(coalesce(col("diff"), lit(0L))).as("net_diff_cents"))
  }

  def ordersReconcileLinesSql: String =
    """WITH s AS (
      |  SELECT l_orderkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS line_cents
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o.o_orderstatus, s.line_cents,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) - s.line_cents AS diff
      |  FROM orders o LEFT JOIN s ON s.l_orderkey = o.o_orderkey)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CASE WHEN line_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
      |  CAST(sum(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_underbilled,
      |  CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_overbilled,
      |  CAST(max(abs(diff)) AS BIGINT) AS max_abs_diff_cents,
      |  CAST(sum(coalesce(diff, 0)) AS BIGINT) AS net_diff_cents
      |FROM j GROUP BY o_orderstatus""".stripMargin

  private val EntropyCols = Seq("o_orderstatus", "o_orderpriority")

  /** Per-column Shannon entropy of the categorical order attributes — the
    * information-theoretic face of [[ordersProfile]] (how many nats a
    * column actually carries; the input to any feature-relevance or
    * anonymity-risk readout).
    *
    * Exactness: `H = (N·ln N − Σ c·ln c) / N`; each `ln` takes an INTEGER
    * count, snaps to micro-nats per distinct value, and multiplies by the
    * integer count BEFORE the sum — associative, engine-identical; the
    * single division emits both the floored integer micro-nats and the
    * one-IEEE-division readable double.
    *
    * Scale shape: one stacked pass → (column, value) partial-agg counts
    * (vocabulary-bounded shuffle), a |columns|-row entropy agg, broadcast
    * 1-row N. */
  def ordersEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .select(explode(array(EntropyCols.map(c =>
        struct(lit(c).as("col_name"), col(c).as("v"))): _*)).as("c"))
      .select(col("c.col_name"), col("c.v"))
    val n = Tables.orders(spark, dir).agg(count(lit(1)).as("n_rows"))
    cells.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(expr("c * cast(round(ln(c) * 1000000) as bigint)")).as("sum_clnc_micro"))
      .crossJoin(broadcast(n))
      .select(col("col_name"), col("n_distinct"), col("n_rows"),
        expr("(n_rows * cast(round(ln(n_rows) * 1000000) as bigint) - sum_clnc_micro) div n_rows")
          .as("entropy_micro"))
      .withColumn("entropy_nats", round(col("entropy_micro") / 1000000.0, 6))
  }

  def ordersEntropySql: String = {
    def block(c: String): String =
      s"""SELECT '$c' AS col_name, $c AS v FROM orders"""
    s"""WITH cells AS (${EntropyCols.map(block).mkString("\nUNION ALL\n")}),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders),
       |vc AS (SELECT col_name, v, CAST(count(*) AS BIGINT) AS c
       |       FROM cells GROUP BY 1, 2)
       |SELECT col_name, CAST(count(*) AS BIGINT) AS n_distinct, n_rows,
       |  CAST((n_rows * CAST(round(ln(n_rows) * 1000000) AS BIGINT)
       |        - CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT))
       |    // n_rows AS BIGINT) AS entropy_micro,
       |  round(CAST((n_rows * CAST(round(ln(n_rows) * 1000000) AS BIGINT)
       |        - CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT))
       |    // n_rows AS BIGINT) / 1000000.0e0, 6) AS entropy_nats
       |FROM vc, n GROUP BY col_name, n_rows""".stripMargin
  }

  /** Mutual information between order status and priority — the
    * pairwise-dependence member of the information profile: how much one
    * categorical column says about another (feature redundancy /
    * leakage detection). `I = Σ c_xy · ln(c_xy·N / (c_x·c_y)) / N`, every
    * `ln` on an exact int64 ratio snapped to micro-nats before the
    * weighted sum, floor-divided once — engine-identical (positive and
    * negative cell terms both scale exactly).
    *
    * Scale: one pass → the |X|×|Y| joint partial agg; marginals derive
    * from the joint (never a second scan) and attach by broadcast. */
  def ordersMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val joint = graft.Caches.persisted(
      Tables.orders(spark, dir)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("c_xy")))
    val mx = joint.groupBy(col("o_orderstatus")).agg(sum(col("c_xy")).as("c_x"))
    val my = joint.groupBy(col("o_orderpriority")).agg(sum(col("c_xy")).as("c_y"))
    val n = joint.agg(sum(col("c_xy")).as("n_rows"))
    joint
      .join(broadcast(mx), "o_orderstatus")
      .join(broadcast(my), "o_orderpriority")
      .crossJoin(broadcast(n))
      .select(
        expr("""sum(c_xy * cast(round(ln((c_xy * n_rows) / (c_x * c_y)) * 1000000) as bigint))"""
          ).as("num_micro"),
        first(col("n_rows")).as("n_rows"))
      // true MI >= 0 but micro-rounding can leave the numerator a few
      // micro-nats negative on independent columns, where Spark's `div`
      // truncates toward zero and DuckDB's `//` floors — spell the floor
      // out so both engines agree on every sign
      .select(col("n_rows"),
        expr("""CASE WHEN num_micro >= 0 THEN num_micro div n_rows
               |     ELSE -((-num_micro + n_rows - 1) div n_rows) END""".stripMargin)
          .as("mi_micro"))
      .withColumn("mi_nats", round(col("mi_micro") / 1000000.0, 6))
  }

  /** RFM segmentation — the marketing-analytics staple: every customer
    * scored 1–5 on Recency (days since last order, most recent = 5),
    * Frequency (order count) and Monetary (lifetime revenue in exact
    * cents) via `ntile(5)`, reported per (R,F,M) cell. ntile is the SQL
    * standard's equal-height bucketing (first `n mod 5` buckets take the
    * extra row), so with a TOTAL order — metric then customer id — both
    * engines cut identical quintiles; no float quantile semantics enter.
    * Customers with no orders are out of scope (no RFM without a
    * transaction), matching the oracle's inner join.
    *
    * Scale shape: the fact table collapses to one custkey-keyed partial
    * agg; the three ntile windows run over that |customers|-sized
    * aggregate (dimension-scale, not fact-scale — the [[partAbcClass]]
    * caveat). The global max-date anchor is a broadcast 1-row crossJoin.
    * Output is ≤125 cells. */
  def customerRfm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: the custkey aggregate feeds both the anchor scalar and
    // the main pass — without it the fact table is scanned twice
    val perCust = graft.Caches.persisted(Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents")))
    val anchor = perCust.agg(max(col("last_order")).as("anchor"))
    perCust
      .crossJoin(broadcast(anchor))
      .withColumn("rec_days", datediff(col("anchor"), col("last_order")).cast("bigint"))
      // score 5 = best: most recent, most orders, most revenue
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("rec_days").desc, col("o_custkey").asc)).cast("bigint"))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("freq").asc, col("o_custkey").asc)).cast("bigint"))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("cents").asc, col("o_custkey").asc)).cast("bigint"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("monetary_cents"),
        max(col("freq")).as("max_orders"))
  }

  def customerRfmSql: String =
    """WITH pc AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_order,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |a AS (SELECT max(last_order) AS anchor FROM pc),
      |s AS (
      |  SELECT
      |    CAST(ntile(5) OVER (ORDER BY datediff('day', last_order, anchor) DESC, o_custkey ASC) AS BIGINT) AS r_score,
      |    CAST(ntile(5) OVER (ORDER BY freq ASC, o_custkey ASC) AS BIGINT) AS f_score,
      |    CAST(ntile(5) OVER (ORDER BY cents ASC, o_custkey ASC) AS BIGINT) AS m_score,
      |    freq, cents
      |  FROM pc, a)
      |SELECT r_score, f_score, m_score,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(cents) AS BIGINT) AS monetary_cents,
      |  CAST(max(freq) AS BIGINT) AS max_orders
      |FROM s GROUP BY 1, 2, 3""".stripMargin

  /** Benford first-digit audit of order totals — the forensic-accounting
    * screen: naturally-occurring amounts follow P(d) = log₁₀(1 + 1/d);
    * fabricated ones usually don't. Observed shares are exact ppm (count ·
    * 10⁶ div N); the expected shares are the nine PRECOMPUTED constants
    * ⌊10⁶·log₁₀(1+1/d)⌋ embedded identically in both engines, so no log is
    * ever evaluated at query time and the deviation column is bit-exact.
    * The leading digit comes from the cents string — a pure integer-string
    * operation, immune to float formatting.
    *
    * Scale shape: one narrow scan → 9-row partial agg; N attaches as a
    * broadcast 1-row crossJoin. */
  def ordersBenford(spark: SparkSession, dir: String): DataFrame = {
    // ⌊10⁶·log₁₀(1+1/d)⌋ for d = 1..9
    val expected = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L,
      57991L, 51152L, 45757L)
    val counts = Tables.orders(spark, dir)
      .select(substring(round(col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1)
        .cast("bigint").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_orders"))
    val n = counts.agg(sum(col("n_orders")).as("n_total"))
    counts
      .crossJoin(broadcast(n))
      .withColumn("observed_ppm", expr("n_orders * 1000000L div n_total"))
      .withColumn("expected_ppm",
        expected.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
          when(col("digit") === (i + 1).toLong, p).otherwise(acc)
        })
      .select(col("digit"), col("n_orders"), col("observed_ppm"),
        col("expected_ppm"),
        (col("observed_ppm") - col("expected_ppm")).as("deviation_ppm"))
  }

  def ordersBenfordSql: String =
    """WITH c AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1),
      |n AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_total FROM c),
      |e(digit, expected_ppm) AS (VALUES (1, 301029), (2, 176091), (3, 124938),
      |  (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152), (9, 45757))
      |SELECT c.digit, n_orders,
      |  n_orders * 1000000 // n_total AS observed_ppm,
      |  CAST(expected_ppm AS BIGINT) AS expected_ppm,
      |  n_orders * 1000000 // n_total - expected_ppm AS deviation_ppm
      |FROM c JOIN e ON c.digit = e.digit, n""".stripMargin

  /** Whole-schema foreign-key orphan audit — the referential-integrity
    * sweep a warehouse runs after every load: for each of the seven FK
    * edges in the schema, how many child rows point at a missing parent?
    * ([[ordersReconcileLines]] audits one edge's VALUES; this audits every
    * edge's KEYS.) Zero orphans is the healthy answer — the audit's value
    * is that it PROVES zero, with the child-row and distinct-key counts
    * as non-degenerate witnesses that each join actually ran.
    *
    * Scale shape: each edge is one narrow (fk)-column pass — a partial
    * agg for the counts and a keys-only anti join for the orphans
    * (dimension parents broadcast; the orders parent stays a keyed
    * shuffle of 8-byte keys). Seven one-row results union. */
  def fkOrphanAudit(spark: SparkSession, dir: String): DataFrame = {
    def audit(edge: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String, bcast: Boolean): DataFrame = {
      val keys = parent.select(col(pk))
      val par = if (bcast) broadcast(keys) else keys
      val stats = child.select(col(fk)).agg(
        count(lit(1)).as("n_child_rows"),
        countDistinct(col(fk)).as("n_distinct_fk"))
      val orphans = child.select(col(fk))
        .join(par, col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      stats.crossJoin(orphans).select(lit(edge).as("fk_edge"),
        col("n_child_rows"), col("n_distinct_fk"), col("n_orphans"))
    }
    val li = Tables.lineitem(spark, dir)
    Seq(
      audit("lineitem->orders", li, "l_orderkey", Tables.orders(spark, dir), "o_orderkey", bcast = false),
      audit("lineitem->part", li, "l_partkey", Tables.part(spark, dir), "p_partkey", bcast = true),
      audit("lineitem->supplier", li, "l_suppkey", Tables.supplier(spark, dir), "s_suppkey", bcast = true),
      audit("orders->customer", Tables.orders(spark, dir), "o_custkey", Tables.customer(spark, dir), "c_custkey", bcast = true),
      audit("customer->nation", Tables.customer(spark, dir), "c_nationkey", Tables.nation(spark, dir), "n_nationkey", bcast = true),
      audit("supplier->nation", Tables.supplier(spark, dir), "s_nationkey", Tables.nation(spark, dir), "n_nationkey", bcast = true),
      audit("nation->region", Tables.nation(spark, dir), "n_regionkey", Tables.region(spark, dir), "r_regionkey", bcast = true)
    ).reduce(_ unionByName _)
  }

  /** Join-key skew report over the fact table — the diagnostic a data
    * engineer runs BEFORE choosing a salting/AQE strategy: for each join
    * key column, the key count, the heaviest key's row count, and the
    * skew ratio (max over mean, exact ppm — mean = rows div keys, both
    * int64). A ratio near 10⁶ means uniform keys (broadcast/plain shuffle
    * is fine); orders of magnitude above it names the key that needs
    * salting. The heaviest key itself is reported (ties to the smallest
    * key) so the fix can target it.
    *
    * Scale shape: ONE stacked narrow pass (the [[ordersEntropy]] explode
    * shape) → a (column, key) partial agg → a |columns|-row argmax rollup
    * via struct-max. Nothing holistic, nothing per-key downstream. */
  def lineitemSkewReport(spark: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.lineitem(spark, dir)
      .select(explode(array(
        struct(lit("l_orderkey").as("col_name"), col("l_orderkey").as("k")),
        struct(lit("l_partkey").as("col_name"), col("l_partkey").as("k")),
        struct(lit("l_suppkey").as("col_name"), col("l_suppkey").as("k")))).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.k").as("k"))
      .groupBy(col("col_name"), col("k"))
      .agg(count(lit(1)).as("c"))
    perKey.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(struct(col("c").as("c"), (-col("k")).as("nk"))).as("m"))
      .select(col("col_name"), col("n_keys"), col("n_rows"),
        col("m.c").as("max_rows_per_key"),
        (-col("m.nk")).as("heaviest_key"),
        expr("m.c * 1000000L div (n_rows div n_keys)").as("skew_ratio_ppm"))
  }

  def lineitemSkewReportSql: String =
    """WITH stacked AS (
      |  SELECT 'l_orderkey' AS col_name, l_orderkey AS k FROM lineitem
      |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
      |pk AS (SELECT col_name, k, count(*) AS c FROM stacked GROUP BY 1, 2),
      |agg AS (
      |  SELECT col_name, CAST(count(*) AS BIGINT) AS n_keys,
      |    CAST(sum(c) AS BIGINT) AS n_rows
      |  FROM pk GROUP BY 1),
      |hv AS (
      |  SELECT col_name, c AS max_rows_per_key, k AS heaviest_key
      |  FROM (SELECT pk.*, row_number() OVER (
      |          PARTITION BY col_name ORDER BY c DESC, k ASC) AS rn FROM pk) t
      |  WHERE rn = 1)
      |SELECT col_name, n_keys, n_rows,
      |  CAST(max_rows_per_key AS BIGINT) AS max_rows_per_key,
      |  CAST(heaviest_key AS BIGINT) AS heaviest_key,
      |  CAST(max_rows_per_key * 1000000 // (n_rows // n_keys) AS BIGINT) AS skew_ratio_ppm
      |FROM agg JOIN hv USING (col_name)""".stripMargin

  private[graft] val SaltBuckets = 64

  /** The skewed-key expression both sides of the salted join share: half
    * the part catalog collapses onto key 0 — a deliberate hot key carrying
    * ~50% of the fact rows, the pathology [[lineitemSkewReport]] exists to
    * detect. */
  private def skewKey(c: org.apache.spark.sql.Column) =
    when(c % 10 < 5, lit(0L)).otherwise(c)

  /** The salted shuffled join itself, pre-aggregation — the CURE to the
    * skew [[lineitemSkewReport]] diagnoses, as a first-class operator
    * rather than a design note. The plain shuffled join on the hot key
    * sends ~half the fact table to ONE reducer (the straggler that decides
    * a 100 TB job's wall-clock); salting:
    *
    *   - FACT side: salt = hash(row identity) mod [[SaltBuckets]] — pure
    *     repartitioning metadata, deterministic but value-irrelevant.
    *   - DIM side: each row REPLICATES across all [[SaltBuckets]] salts
    *     (the standard dim-side explode; dim pays ×S rows, the fact side
    *     pays nothing).
    *   - join on (k, salt): the hot key's rows now spread across S
    *     reducers; results are identical to the unsalted join because
    *     every (k, salt) fact row meets exactly its (k, salt) dim replica.
    *
    * The dim side is deliberately `shuffle_hash`-hinted, NOT broadcast —
    * salting exists precisely for the regime where the dim is too big to
    * broadcast and the fact key is hot; at broadcast-able dim sizes the
    * broadcast join needs no salt at all (no shuffle of the fact side).
    * SkewSuite measures the balanced-task property on this frame: max
    * per-partition row share, salted vs unsalted. AQE's runtime skew
    * split (SkewSuite's other witness) is the ALTERNATIVE cure when the
    * engine owns the decision; explicit salting is the one a pipeline
    * author controls, works under any join strategy, and composes with
    * bucketed layouts AQE cannot re-split. */
  private[graft] def saltedJoinBase(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_extendedprice"))
      .withColumn("k", skewKey(col("l_partkey")))
      .withColumn("salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(SaltBuckets)))
    val dim = Tables.part(spark, dir)
      .select(skewKey(col("p_partkey")).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_parts"))
      .withColumn("salt",
        explode(org.apache.spark.sql.functions.sequence(
          lit(0L), lit(SaltBuckets - 1L))))
    fact.join(dim.hint("shuffle_hash"), Seq("k", "salt"))
  }

  /** Registered form: the salted join rolled up per (returnflag, hot-key
    * flag) in exact cents — value-identical to the plain unsalted join the
    * oracle runs, which is the whole point of salting. */
  def saltedSkewJoin(spark: SparkSession, dir: String): DataFrame =
    saltedJoinBase(spark, dir)
      .groupBy(col("l_returnflag"), (col("k") === 0L).as("is_hot"))
      .agg(count(lit(1)).as("n_rows"),
        sum(cents(col("l_extendedprice"))).as("revenue_cents"),
        sum(col("n_parts")).as("sum_group_parts"))
      .select(col("l_returnflag"), col("is_hot"), col("n_rows"),
        col("revenue_cents"), col("sum_group_parts"))

  def saltedSkewJoinSql: String =
    """WITH f AS (
      |  SELECT CASE WHEN l_partkey % 10 < 5 THEN 0 ELSE l_partkey END AS k,
      |    l_returnflag, l_extendedprice
      |  FROM lineitem),
      |d AS (
      |  SELECT CASE WHEN p_partkey % 10 < 5 THEN 0 ELSE p_partkey END AS k,
      |    CAST(count(*) AS BIGINT) AS n_parts
      |  FROM part GROUP BY 1)
      |SELECT l_returnflag, (f.k = 0) AS is_hot,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  CAST(sum(n_parts) AS BIGINT) AS sum_group_parts
      |FROM f JOIN d ON f.k = d.k
      |GROUP BY 1, 2""".stripMargin

  /** Snapshot DIFF between two versions of a keyed table — the lakehouse
    * "what changed between v1 and v2" operator (Delta/Iceberg table-diff
    * shape, and the generalization of [[nationReconciliation]]'s two-book
    * compare to row-version semantics): every key is classified
    * added / removed / changed / unchanged by a full-outer join on the key
    * with a row-content hash compare, then rolled up per class with the
    * netted money delta. Version B is derived deterministically from the
    * base snapshot (keys ≡0 mod 97 deleted, priorities bumped at mod 89,
    * prices +1.00 at mod 83) so the operator is self-contained and
    * oracle-exact; a deployment points the two sides at real snapshots.
    *
    * Scale shape: both sides shuffle once on the key (or co-located
    * bucketed snapshots join with zero exchange — the
    * [[graft.sources.BucketedTables]] layout); the hash compare is one
    * codegen'd projection; the report is a 4-key partial agg. Neither
    * side broadcasts — snapshots are both corpus-sized by definition. */
  def ordersSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("price_cents"))
    val a = base.select(col("o_orderkey").as("k"), col("o_orderstatus").as("st_a"),
      col("o_orderpriority").as("pr_a"), col("price_cents").as("c_a"))
    val b = base
      .filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st_b"),
        when(col("o_orderkey") % 89 === 0, lit("0-BUMPED"))
          .otherwise(col("o_orderpriority")).as("pr_b"),
        when(col("o_orderkey") % 83 === 0, col("price_cents") + 100L)
          .otherwise(col("price_cents")).as("c_b"))
    a.join(b, Seq("k"), "full_outer")
      .select(
        when(col("st_b").isNull, "removed")
          .when(col("st_a").isNull, "added")
          .when(col("st_a") === col("st_b") && col("pr_a") === col("pr_b") &&
            col("c_a") === col("c_b"), "unchanged")
          .otherwise("changed").as("status"),
        coalesce(col("c_b"), lit(0L)).as("cb"),
        coalesce(col("c_a"), lit(0L)).as("ca"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cb") - col("ca")).as("cents_delta"))
  }

  def ordersSnapshotDiffSql: String =
    """WITH a AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st_a, o_orderpriority AS pr_a,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS c_a
      |  FROM orders),
      |b AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st_b,
      |    CASE WHEN o_orderkey % 89 = 0 THEN '0-BUMPED' ELSE o_orderpriority END AS pr_b,
      |    CASE WHEN o_orderkey % 83 = 0
      |         THEN CAST(round(o_totalprice * 100) AS BIGINT) + 100
      |         ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS c_b
      |  FROM orders WHERE o_orderkey % 97 <> 0)
      |SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(cb - ca) AS BIGINT) AS cents_delta
      |FROM (
      |  SELECT CASE WHEN st_b IS NULL THEN 'removed'
      |              WHEN st_a IS NULL THEN 'added'
      |              WHEN st_a = st_b AND pr_a = pr_b AND c_a = c_b THEN 'unchanged'
      |              ELSE 'changed' END AS status,
      |    coalesce(c_b, 0) AS cb, coalesce(c_a, 0) AS ca
      |  FROM a FULL OUTER JOIN b USING (k)) t
      |GROUP BY status""".stripMargin

  def fkOrphanAuditSql: String = {
    def one(edge: String, child: String, fk: String, parent: String, pk: String): String =
      s"""SELECT '$edge' AS fk_edge,
         |  CAST(count(*) AS BIGINT) AS n_child_rows,
         |  CAST(count(DISTINCT $fk) AS BIGINT) AS n_distinct_fk,
         |  CAST(sum(CASE WHEN $pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         |FROM $child LEFT JOIN $parent ON $fk = $pk""".stripMargin
    Seq(
      one("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      one("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      one("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      one("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      one("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      one("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      one("nation->region", "nation", "n_regionkey", "region", "r_regionkey")
    ).mkString("", "\nUNION ALL\n", "")
  }

  def ordersMutualInfoSql: String =
    """WITH joint AS (
      |  SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS c_xy
      |  FROM orders GROUP BY 1, 2),
      |mx AS (SELECT o_orderstatus, CAST(sum(c_xy) AS BIGINT) AS c_x FROM joint GROUP BY 1),
      |my AS (SELECT o_orderpriority, CAST(sum(c_xy) AS BIGINT) AS c_y FROM joint GROUP BY 1),
      |n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_rows FROM joint)
      |SELECT n_rows,
      |  CAST(CAST(sum(c_xy * CAST(round(ln((c_xy * n_rows) / (c_x * c_y)) * 1000000) AS BIGINT)) AS BIGINT)
      |    // n_rows AS BIGINT) AS mi_micro,
      |  round(CAST(CAST(sum(c_xy * CAST(round(ln((c_xy * n_rows) / (c_x * c_y)) * 1000000) AS BIGINT)) AS BIGINT)
      |    // n_rows AS BIGINT) / 1000000.0e0, 6) AS mi_nats
      |FROM joint JOIN mx USING (o_orderstatus) JOIN my USING (o_orderpriority), n
      |GROUP BY n_rows""".stripMargin
}
