package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

/** Core relational operators over the harness tables — the query surface
  * the reference lacks entirely (SURVEY.md §2A "absent" list) mapped to
  * stock Spark: scan → filter → project → agg / join / window / sort /
  * set-ops. All declarative DataFrame ops so Catalyst does pushdown,
  * pruning, join selection and AQE; no RDDs, no UDFs.
  *
  * Scale notes per operator are inline; the common rules:
  *  - dimension joins (region/nation/customer/supplier/part) are
  *    broadcast-hinted — at 100 TB the fact tables shuffle, dims never.
  *  - aggregates are partial (map-side combine) by construction of
  *    groupBy().agg.
  *  - every query is rounded/aliased deterministically for the DuckDB
  *    oracle hash-compare.
  */
object Relational {

  /** Flagship: pricing summary — TPC-H Q1 shape over lineitem.
    * scan → filter(pushdown) → groupBy(2 low-card keys).agg.
    * Scale: partial aggregation reduces each partition to ≤|RF×LS| rows
    * before the (tiny) shuffle; the scan prunes to 7 of 11 columns. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Offset-predicate scan — the reference's `--offset` token bound
    * (`read.go:30, 83-86`; SURVEY.md §2A #21) as a pushed-down range
    * predicate plus column projection (#16's SELECT-cols-only).
    * Scale: both the filter and the 3-column projection reach the parquet
    * scan (PushedFilters / ReadSchema) — no full-table read. */
  def offsetScan(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    // scale-relative bound: mean key, joined in as a broadcast scalar (no
    // driver collect; the range predicate still prunes via AQE runtime
    // filtering / dynamic pruning at real scale)
    // floor explicitly: DuckDB's double→BIGINT cast rounds, Spark's truncates
    val bound = o.agg(floor(avg(col("o_orderkey"))).cast("long").as("bound"))
    o.join(broadcast(bound))
      .where(col("o_orderkey") > col("bound"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  val offsetScanSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderkey > (SELECT CAST(floor(avg(o_orderkey)) AS BIGINT) FROM orders)""".stripMargin

  /** Multi-way star join: revenue per region/nation. Fact tables join on
    * keys; all three dimension sides are broadcast-hinted so at 100 TB the
    * only shuffle is lineitem⋈orders (and AQE can pick SMJ there).
    * customer is ~150k rows/SF=1 → still broadcastable at real scale. */
  def revenueByNation(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = broadcast(Tables.customer(s, d))
    val n = broadcast(Tables.nation(s, d))
    val r = broadcast(Tables.region(s, d))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val revenueByNationSql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Window function: top-3 orders per customer by price, deterministic
    * tiebreak on orderkey. Scale: single shuffle on o_custkey; rank
    * computed streaming per partition — no global sort. */
  def windowTopOrders(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rank"))
  }

  val windowTopOrdersSql: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rank
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      |  FROM orders)
      |WHERE rank <= 3""".stripMargin

  /** Global top-k with deterministic tiebreak — Spark plans
    * orderBy+limit as TakeOrderedAndProject (per-partition top-k then
    * k-way merge on the driver; no global sort shuffle). */
  def topRevenueParts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("part_revenue"))
      .orderBy(col("part_revenue").desc, col("l_partkey").asc)
      .limit(100)

  val topRevenuePartsSql: String =
    """SELECT l_partkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_revenue
      |FROM lineitem GROUP BY l_partkey
      |ORDER BY part_revenue DESC, l_partkey ASC LIMIT 100""".stripMargin

  /** Set operations: customers with orders but no high-value order —
    * EXCEPT (distinct semantics in both engines). Scale: both sides
    * aggregate/shuffle on the same key; AQE coalesces. */
  def setOpsCustomers(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val withOrders = o.select(col("o_custkey"))
    val highValue = o.where(col("o_totalprice") > 200000.0).select(col("o_custkey"))
    withOrders.except(highValue).orderBy(col("o_custkey"))
  }

  val setOpsCustomersSql: String =
    """SELECT o_custkey FROM orders
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
      |ORDER BY o_custkey""".stripMargin

  /** ROLLUP grouping sets over returnflag/linestatus — subtotals + grand
    * total; identical NULL-marking semantics in DuckDB. */
  def rollupPricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val rollupPricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Exact + distinct aggregation shapes: distinct count per segment.
    * (approx_count_distinct is benchmarked separately, rows-only — HLL
    * implementations differ across engines.) */
  def distinctCustomers(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))

  val distinctCustomersSql: String =
    """SELECT c_mktsegment,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** JSON property extraction from events.props (SURVEY.md §2B multimodal/
    * JSON row). regexp_extract is used on both sides for engine-portable
    * semantics; the Spark plan stays in whole-stage codegen. */
  def jsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("k")), 4).as("avg_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val jsonPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  round(avg(k), 4) AS avg_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Event-time tumbling windows (10 min) over events.ts — the batch face
    * of SURVEY.md §2B event-time windows. Bucket start exposed as epoch
    * seconds (BIGINT) for engine-portable comparison; the streaming
    * variant uses window()/watermark (graft.streaming). */
  def eventTumblingWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("window_start", (unix_timestamp(col("ts")).divide(600)).cast("long") * 600)
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val eventTumblingWindowsSql: String =
    """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 AS window_start,
      |  event_type, count(*) AS n_events,
      |  round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Semi-join shape (TPC-H Q4): order priority counts where at least one
    * lineitem shipped late. leftsemi = one probe, no fact-side dup. */
  def orderPriorityCheck(s: SparkSession, d: String): DataFrame = {
    val late = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"))
    Tables.orders(s, d)
      .join(late, col("o_orderkey") === col("l_orderkey"), "leftsemi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val orderPriorityCheckSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Anti-join: customers with no RECENT order (none since 2001-01-01). */
  def customersWithoutOrders(s: SparkSession, d: String): DataFrame = {
    val recent = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.customer(s, d)
      .join(recent, col("c_custkey") === col("o_custkey"), "leftanti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** CUBE over event_type × hour-of-day: all four grouping sets. */
  def cubeEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("hour_of_day", hour(col("ts")).cast("int"))
      .cube(col("event_type"), col("hour_of_day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first, col("hour_of_day").asc_nulls_first)

  val cubeEventsSql: String =
    """SELECT event_type, hour_of_day, count(*) AS n,
      |  round(sum(value), 4) AS sum_value
      |FROM (SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day, value
      |      FROM events)
      |GROUP BY CUBE (event_type, hour_of_day)
      |ORDER BY event_type NULLS FIRST, hour_of_day NULLS FIRST""".stripMargin

  /** Pivot via conditional aggregation (engine-portable — DataFrame
    * .pivot() compiles to exactly this shape): event-type columns per
    * hour-of-day. */
  def pivotEvents(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = types.map(t =>
      round(sum(when(col("event_type") === t, col("value")).otherwise(0.0)), 4)
        .as(s"${t}_value"))
    Tables.events(s, d)
      .withColumn("hour_of_day", hour(col("ts")).cast("int"))
      .groupBy(col("hour_of_day"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("hour_of_day"))
  }

  val pivotEventsSql: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cols = types.map(t =>
      s"round(sum(CASE WHEN event_type = '$t' THEN value ELSE 0.0 END), 4) AS ${t}_value")
      .mkString(",\n  ")
    s"""SELECT CAST(hour(ts) AS INT) AS hour_of_day,
       |  $cols
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** INTERSECT (distinct semantics both engines): customers active in
    * both the first and last order-month of the dataset. */
  def intersectCustomers(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val early = o.where(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val late = o.where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    early.intersect(late).orderBy(col("o_custkey"))
  }

  val intersectCustomersSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      |ORDER BY o_custkey""".stripMargin

  /** Scalar-function zoo in one codegen'd projection: string, date, math
    * and conditional functions with engine-portable semantics. */
  def scalarFunctions(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_type")).as("type_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        round(sqrt(col("p_retailprice")), 4).as("price_sqrt"),
        round(log(col("p_retailprice") + 1.0), 4).as("price_log"),
        (col("p_size") % 5).cast("int").as("size_mod"),
        when(col("p_size") >= 25, "large").when(col("p_size") >= 10, "medium")
          .otherwise("small").as("size_class"),
        coalesce(nullif(col("p_brand"), lit("Brand#1")), lit("OTHER")).as("brand_or_other"))
      .orderBy(col("p_partkey"))

  val scalarFunctionsSql: String =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_upper,
      |  substring(p_name, 1, 8) AS name_prefix,
      |  length(p_type) AS type_len,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  round(sqrt(p_retailprice), 4) AS price_sqrt,
      |  round(ln(p_retailprice + 1.0), 4) AS price_log,
      |  CAST(p_size % 5 AS INT) AS size_mod,
      |  CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'medium'
      |       ELSE 'small' END AS size_class,
      |  coalesce(nullif(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Supplier account balances rolled up the geography dims (completes
    * coverage of every harness table; broadcast dim chain as usual). */
  def supplierBalances(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal")), 2).as("total_bal"),
        round(avg(col("s_acctbal")), 4).as("avg_bal"))
      .orderBy(col("r_name"))

  val supplierBalancesSql: String =
    """SELECT r_name, count(*) AS n_suppliers,
      |  round(sum(s_acctbal), 2) AS total_bal,
      |  round(avg(s_acctbal), 4) AS avg_bal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** JSON props via from_json into MapType (the FIXTURES.md mapping for
    * events.props) — map access, key existence, per-key stats. The oracle
    * extracts the same key with regexp (value-identical for this data). */
  def propsAsMap(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      .withColumn("k", col("m").getItem("k"))
      .groupBy((col("k") % 10).cast("int").as("k_mod"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("k_mod"))

  val propsAsMapSql: String =
    """SELECT CAST(k % 10 AS INT) AS k_mod, count(*) AS n,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
      |      FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q3 shape: shipping-priority top-10 — 3-way join, filter both
    * fact sides, group, top-k with deterministic tiebreak. */
  def shippingPriority(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") < cut)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > cut)
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin

  /** TPC-H Q6 shape: forecast-revenue — pure scan+filter+scalar agg, the
    * pushdown-everything query (range predicates on 3 columns). */
  def forecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.08) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  val forecastRevenueSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.08 AND l_quantity < 24""".stripMargin

  /** TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share). */
  def promoRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type").startsWith("PROMO"),
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) * 100.0 /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("promo_pct"))

  val promoRevenueSql: String =
    """SELECT round(
      |  sum(CASE WHEN p_type LIKE 'PROMO%'
      |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 100.0 /
      |  sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** Window-function variety: per-user event gaps (lag, partitioned by
    * user) + activity quartiles.
    *
    * Quartile assignment is by exact percentile CUT-POINTS
    * (`percentile_disc` — no interpolation, so the cuts are actual data
    * values and engine-portable) broadcast to every row, NOT a global
    * `ntile` window: ntile with no partitionBy funnels every row through
    * ONE task, which is a scale-killer at 100 TB (billions of users in a
    * single sort). The cut-point plan is a 1-row aggregate + broadcast
    * nested-loop join + map-side CASE — every stage fully parallel.
    * Semantic difference vs ntile: users tied on n_events land in the
    * SAME quartile (value-based buckets) instead of being split
    * arbitrarily — the better semantics for analytics anyway. */
  def userActivityStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        (unix_timestamp(col("ts")) -
          lag(unix_timestamp(col("ts")), 1).over(byUser)).as("gap_s"))
      .groupBy(col("user_id"))
      // keep exact integer sums; a rounded inner avg double-rounds and
      // flips the oracle compare at half-boundaries
      .agg(count(lit(1)).as("n_events"),
        (sum(col("gap_s")).cast("double") / count(col("gap_s"))).as("avg_gap_s"))
    val cuts = gaps.agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY n_events)").as("p25"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY n_events)").as("p50"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY n_events)").as("p75"))
    gaps.join(broadcast(cuts)) // 1-row broadcast: the q02 scalar pattern
      .withColumn("quartile",
        when(col("n_events") >= col("p75"), 1)
          .when(col("n_events") >= col("p50"), 2)
          .when(col("n_events") >= col("p25"), 3)
          .otherwise(4))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("total_events"),
        round(avg(col("avg_gap_s")), 2).as("mean_avg_gap"))
      .orderBy(col("quartile"))
  }

  val userActivityStatsSql: String =
    """WITH gaps AS (
      |  SELECT user_id, count(*) AS n_events,
      |    CAST(sum(gap_s) AS DOUBLE) / count(gap_s) AS avg_gap_s
      |  FROM (
      |    SELECT user_id,
      |      CAST(floor(epoch(ts)) AS BIGINT) -
      |        lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
      |          OVER (PARTITION BY user_id ORDER BY event_id) AS gap_s
      |    FROM events)
      |  GROUP BY user_id),
      | cuts AS (
      |  SELECT
      |    percentile_disc(0.25) WITHIN GROUP (ORDER BY n_events) AS p25,
      |    percentile_disc(0.50) WITHIN GROUP (ORDER BY n_events) AS p50,
      |    percentile_disc(0.75) WITHIN GROUP (ORDER BY n_events) AS p75
      |  FROM gaps),
      | q AS (
      |  SELECT g.*,
      |    CASE WHEN n_events >= p75 THEN 1
      |         WHEN n_events >= p50 THEN 2
      |         WHEN n_events >= p25 THEN 3 ELSE 4 END AS quartile
      |  FROM gaps g CROSS JOIN cuts)
      |SELECT quartile, count(*) AS n_users,
      |  CAST(sum(n_events) AS BIGINT) AS total_events,
      |  round(avg(avg_gap_s), 2) AS mean_avg_gap
      |FROM q GROUP BY quartile ORDER BY quartile""".stripMargin

  /** Correlated-subquery / groupwise-min shape (TPC-H Q2's core, adapted
    * to the harness schema — no partsupp table, so lineitem is the
    * part↔supplier bridge): for every part, the supplier(s) achieving the
    * minimum per-unit rate. Decorrelated into two keyed aggregations +
    * one co-partitioned equi-join — all three shuffles share the partkey,
    * so at 100 TB one exchange feeds all stages (no per-row subquery). */
  def minCostSupplier(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"),
      (col("l_extendedprice") / col("l_quantity")).as("rate"))
    // NO round() here: Spark rounds HALF_UP, DuckDB HALF_EVEN, and a rate
    // landing exactly on a .5 boundary at 4 dp flips the compare. The raw
    // IEEE division/min are bit-identical across engines; the driver's
    // float canon (6 significant digits) handles display.
    val perPS = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("rate")).as("ps_rate"))
    val perP = perPS.groupBy(col("l_partkey")).agg(min(col("ps_rate")).as("p_min"))
    perPS.join(perP, "l_partkey")
      .where(col("ps_rate") === col("p_min"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"),
        col("l_suppkey").as("s_suppkey"), col("ps_rate"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  val minCostSupplierSql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(l_extendedprice / l_quantity) AS ps_rate
      |  FROM lineitem GROUP BY 1, 2),
      | pm AS (SELECT l_partkey, min(ps_rate) AS p_min FROM ps GROUP BY 1)
      |SELECT p.p_partkey, p.p_brand, ps.l_suppkey AS s_suppkey, ps.ps_rate
      |FROM ps JOIN pm USING (l_partkey) JOIN part p ON p_partkey = l_partkey
      |WHERE ps_rate = p_min
      |ORDER BY p_partkey, s_suppkey""".stripMargin

  /** EXISTS / NOT-EXISTS chain (TPC-H Q21's core shape): suppliers who
    * shipped late (> 90 days after order date) into multi-supplier
    * orders where NO other supplier shipped late — i.e. the sole
    * blocker. Decorrelated into a left-semi (another supplier exists)
    * and a left-anti (no other late supplier) on the order key: both are
    * keyed equi-joins, the Spark-native form of correlated EXISTS at
    * scale. */
  def soleLateSupplier(s: SparkSession, d: String): DataFrame = {
    // TPC-H Q21 shape, re-planned for scale: the textbook EXISTS/NOT
    // EXISTS formulation (which the ORACLE below still runs) needs two
    // DISTINCTs plus a semi- and an anti-self-join — four shuffles of the
    // fact table. The per-order truth it tests collapses into ONE
    // aggregation: an order contributes iff it has exactly one distinct
    // late supplier and more than one distinct supplier overall, and the
    // contributing supplier is that single late one (max over a 1-element
    // set). One orderkey shuffle (map-side partial) + one tiny supplier
    // agg — the plan that survives a 100× fact table.
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    // two stacked hash-aggs, NOT countDistinct×2 (multiple distinct
    // aggregates plan an Expand that triples the fact rows): first dedup
    // (order, supplier) with a was-ever-late flag, then count per order
    val perPair = l.groupBy(col("l_orderkey"), col("l_suppkey")).agg(
      max(when(col("l_shipdate") > date_add(col("o_orderdate"), 90), 1)
        .otherwise(0)).as("late"))
    val perOrder = perPair.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("n_supp"),
      sum(col("late")).as("n_late"),
      max(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
    perOrder.where(col("n_late") === 1 && col("n_supp") > 1)
      .groupBy(col("late_supp").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(20)
  }

  val soleLateSupplierSql: String =
    """WITH l AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      | late AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM l
      |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY),
      | present AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l),
      | sole AS (
      |  SELECT a.l_orderkey, a.l_suppkey FROM late a
      |  WHERE EXISTS (SELECT 1 FROM present b
      |                WHERE b.l_orderkey = a.l_orderkey
      |                  AND b.l_suppkey <> a.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM late c
      |                    WHERE c.l_orderkey = a.l_orderkey
      |                      AND c.l_suppkey <> a.l_suppkey))
      |SELECT l_suppkey AS s_suppkey, count(*) AS numwait
      |FROM sole GROUP BY 1
      |ORDER BY numwait DESC, s_suppkey ASC LIMIT 20""".stripMargin

  /** Fuzzy key matching via levenshtein (identical semantics in both
    * engines): near-matching part brand/type label pairs. */
  def fuzzyTypeMatch(s: SparkSession, d: String): DataFrame = {
    val t = Tables.part(s, d).select(col("p_brand")).distinct()
    t.as("a").join(t.as("b"),
        col("a.p_brand") < col("b.p_brand") &&
          levenshtein(col("a.p_brand"), col("b.p_brand")) <= 1)
      .select(col("a.p_brand").as("t1"), col("b.p_brand").as("t2"),
        levenshtein(col("a.p_brand"), col("b.p_brand")).as("dist"))
      .orderBy(col("t1"), col("t2"))
  }

  val fuzzyTypeMatchSql: String =
    """SELECT a.p_brand AS t1, b.p_brand AS t2,
      |  levenshtein(a.p_brand, b.p_brand) AS dist
      |FROM (SELECT DISTINCT p_brand FROM part) a
      |JOIN (SELECT DISTINCT p_brand FROM part) b
      |  ON a.p_brand < b.p_brand AND levenshtein(a.p_brand, b.p_brand) <= 1
      |ORDER BY t1, t2""".stripMargin

  /** Sketch aggregation: HyperLogLog++ approximate distinct users per
    * event type, alongside the exact count. HLL implementations are not
    * oracle-portable → rows-only; ScalaTest bounds the relative error. */
  /** Native HLL++ distinct estimate per event type. ORACLE-CHECKED since
    * r7 (was the last rows-only query): the estimate itself is
    * engine-internal (register layout differs per engine), but its
    * CONTRACT is cross-engine checkable: the face emits exact_users
    * (DuckDB recomputes it) and the integer-cross-multiplied within_10pct
    * flag (the oracle asserts TRUE). A broken HLL++ flips the flag →
    * hash mismatch. The 10% bound is the library's spec envelope
    * (PipelineSparkSpec asserts ≤0.10 for the 2%-rsd config — rsd is a
    * standard deviation, not a max, so ~5× headroom is the honest gate;
    * ADVICE r7: the earlier 5% gate could red a CORRECT estimator on a
    * new corpus). The estimate magnitude itself stays spec-asserted; the
    * portable-register twin q78 hash-checks full sketch arithmetic. */
  def approxDistinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) * 10 <= col("exact_users"))
          .as("within_10pct"))
      .orderBy(col("event_type"))

  /** Count-Min sketch frequency estimation: the third sketch family
    * (HLL++ = distinct, MinHash = similarity, CMS = frequency). The
    * sketch is built DISTRIBUTED — Spark's `count_min_sketch` aggregate
    * merges partial sketches map-side, the 100 TB shape; only the final
    * ~KB sketch reaches the driver, where a handful of probe keys are
    * estimated against their exact counts. CMS guarantees est ≥ exact
    * and est ≤ exact + ε·N w.h.p. — asserted in ScalaTest; sketch
    * internals are not oracle-portable → rows-only (q14 precedent). */
  def cmsUserFrequency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"))
    val bytes = ev
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val probes = Seq(1L, 2L, 3L, 4L, 5L)
    val exact = ev.where(col("user_id").isin(probes: _*))
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import s.implicits._
    probes.map(u => (u, exact.getOrElse(u, 0L), cms.estimateCount(u)))
      .toDF("user_id", "exact_n", "est_n")
      .orderBy(col("user_id"))
  }

  /** q77 — Count-Min frequency, PORTABLE and fully distributed: the
    * sketch is a TABLE of (row, bucket, count) built by one hash
    * aggregation (map-side partial merge — the same merge a binary CMS
    * buffer does, in relational form; ≤ depth×width = 10k rows at ANY
    * corpus size), with md5-derived row hashes DuckDB recomputes
    * verbatim. Estimates = min over rows of the probe's bucket count —
    * the CMS estimate identity, so the result is ORACLE-CHECKED exactly
    * (unlike Spark's binary `count_min_sketch`, whose xxhash layout is
    * engine-internal; that path stays spec-covered in
    * [[cmsUserFrequency]]). est ≥ exact by construction; the ε·N bound
    * is spec-asserted. Nothing beyond the 5-row result leaves the
    * executors. */
  val CmsDepth = 5
  val CmsWidth = 2048
  private val CmsProbes = Seq(1L, 2L, 3L, 4L, 5L)

  private def cmsBucket(j: Int, c: Column): Column =
    conv(substring(md5(concat(lit(j.toString), lit("|"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long") % CmsWidth

  def cmsFrequencyPortable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d).select(col("user_id"))
    val sketch = ev
      .select(posexplode(array((0 until CmsDepth).map(j =>
        cmsBucket(j, col("user_id"))): _*)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("n"))
    val probeRows = CmsProbes.toDF("user_id")
    val ph = probeRows.select(col("user_id"),
      posexplode(array((0 until CmsDepth).map(j =>
        cmsBucket(j, col("user_id"))): _*)).as(Seq("j", "bucket")))
    val est = broadcast(ph).join(sketch, Seq("j", "bucket"), "left")
      .na.fill(0L, Seq("n"))
      .groupBy(col("user_id")).agg(min(col("n")).as("est_n"))
    val exact = ev.where(col("user_id").isin(CmsProbes: _*))
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
    probeRows.join(exact, Seq("user_id"), "left").na.fill(0L, Seq("exact_n"))
      .join(est, Seq("user_id"))
      .select(col("user_id"), col("exact_n"), col("est_n"))
      .orderBy(col("user_id"))
  }

  /** q78 — PORTABLE HyperLogLog distinct-count, oracle-checked (the
    * engine-native HLL++ face stays q14/rows-only — its sparse/bias
    * internals are not portable). Classic FM-85/HLL with every
    * engine-sensitive step made exact:
    *
    *  - registers from a 60-bit md5 hash (bucket = h mod m, rho = leading
    *    zeros of the remaining 50 bits + 1) — integer ops both engines;
    *  - the register sum Σ 2^-M_j is scaled by 2^51 and summed as
    *    INTEGERS (shiftleft) — no float accumulation order anywhere;
    *  - the estimate divides literal-for-literal identical expressions,
    *    so both engines execute the same IEEE operations in the same
    *    order; the small-range correction (m·ln(m/V)) rounds at 2 dp,
    *    far above any libm ulp drift.
    *
    * Scale shape: one hash-agg to m=1024 registers per group (map-side
    * partial max), one tiny agg over registers — the same plan a native
    * sketch aggregate produces, in relational form. */
  def hllPortable(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("user_id"))
    val est = ev
      .selectExpr("event_type",
        "CAST(conv(substring(md5(concat('hll|', CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) AS h")
      .selectExpr("event_type", "h % 1024 AS bucket", "h div 1024 AS w")
      .selectExpr("event_type", "bucket",
        "CASE WHEN w = 0 THEN 51 ELSE 51 - length(conv(w, 10, 2)) END AS rho")
      .groupBy(col("event_type"), col("bucket")).agg(max(col("rho")).as("M"))
      .groupBy(col("event_type")).agg(
        expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(51 - M AS INT)))").as("s_present"),
        count(lit(1)).as("present"))
      .selectExpr("event_type",
        "s_present + (1024 - present) * shiftleft(CAST(1 AS BIGINT), 51) AS S",
        "CAST(1024 - present AS DOUBLE) AS V")
      .selectExpr("event_type",
        "(0.7213 / (1.0 + 1.079/1024.0)) * power(2.0, 71.0) / CAST(S AS DOUBLE) AS raw", "V")
      .selectExpr("event_type",
        "round(CASE WHEN raw <= 2560.0 AND V > 0 THEN 1024.0 * ln(1024.0 / V) ELSE raw END, 2) AS approx_users")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("approx_users"), col("exact_users"))
      .orderBy(col("event_type"))
  }

  val hllPortableSql: String =
    """WITH hashed AS (SELECT event_type,
      |   CAST('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      | FROM events),
      | b AS (SELECT event_type, h % 1024 AS bucket, h // 1024 AS w FROM hashed),
      | r AS (SELECT event_type, bucket,
      |   CASE WHEN w = 0 THEN 51 ELSE 51 - length(to_base(w, 2)) END AS rho FROM b),
      | regs AS (SELECT event_type, bucket, max(rho) AS M FROM r GROUP BY 1, 2),
      | agg AS (SELECT event_type,
      |   CAST(sum(1::BIGINT << CAST(51 - M AS INT)) AS BIGINT) AS s_present,
      |   count(*) AS present FROM regs GROUP BY 1),
      | sv AS (SELECT event_type,
      |   s_present + (1024 - present) * (1::BIGINT << 51) AS S,
      |   CAST(1024 - present AS DOUBLE) AS V FROM agg),
      | rawt AS (SELECT event_type,
      |   (0.7213 / (1.0 + 1.079/1024.0)) * power(2.0, 71.0) / CAST(S AS DOUBLE) AS raw, V
      |   FROM sv),
      | est AS (SELECT event_type,
      |   round(CASE WHEN raw <= 2560.0 AND V > 0 THEN 1024.0 * ln(1024.0 / V) ELSE raw END, 2) AS approx_users
      |   FROM rawt),
      | ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
      |        FROM events GROUP BY 1)
      |SELECT event_type, approx_users, CAST(exact_users AS BIGINT) AS exact_users
      |FROM est JOIN ex USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** q101 — KMV (bottom-k) distinct sketch, the 5th sketch family and
    * the only one whose ESTIMATE is hash-exact oracle-checkable: the k
    * minima of a deterministic hash are a pure function of the key set,
    * so DuckDB replays sketch AND estimate bit-for-bit (`ORDER BY h
    * LIMIT k` + the same HUGEINT integral division) — where HLL++ (q14)
    * could only be gated on its accuracy contract. Unlike HLL, KMV
    * sketches also COMPOSE under set algebra: the union sketch is the
    * bottom-k of the merged minima, and inclusion-exclusion over three
    * estimates gives the overlap — "how many distinct keys, and how many
    * do two tables share" with NO distinct shuffle anywhere: per table
    * one narrow scan into a [[graft.functions.KmvAgg]] bounded buffer
    * (≤ k longs per partial, map-side combined; shuffle = tasks×k longs
    * at ANY data volume).
    *
    * Face: 1995 buyers vs 1996 buyers (year-sliced o_custkey sets — the
    * retention/churn composition; chosen over whole-table key sets,
    * which saturate to identical 1500-customer sets in this corpus and
    * gate vacuously), their union and (by inclusion-exclusion, signed)
    * their intersection — est next to exact, so the oracle-checked rows
    * double as an accuracy demonstration (k=256 → ~6% rsd). The exact
    * sides are the demonstration, not the operator: production emits
    * sketches only. */
  private val KmvK = 256
  private def kmvHash(c: Column): Column =
    conv(substring(md5(concat(lit("kmv|"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    import graft.functions.KmvAgg.kmvSketch
    // est from the sorted minima array: exact when the set never filled
    // the buffer, else (k-1)·2^60 div h_k — integral, replayed by DuckDB
    // as HUGEINT //; 255·2^60 needs 68 bits, hence DECIMAL(38,0)
    val est = when(size(col("arr")) < KmvK, size(col("arr")).cast("long"))
      .otherwise(expr(
        s"CAST((CAST(${KmvK - 1} AS DECIMAL(38,0)) * CAST(1152921504606846976 AS DECIMAL(38,0))) div element_at(arr, $KmvK) AS BIGINT)"))
    def sketchOf(metric: String, keys: DataFrame): DataFrame =
      keys.select(kmvHash(col("k")).as("h"), col("k"))
        .agg(kmvSketch(col("h"), KmvK).as("arr"),
          countDistinct(col("k")).as("exact"))
        .select(lit(metric).as("metric"), est.as("est_distinct"),
          col("exact").as("exact_distinct"))
        .cache() // 1 row; reused by the inclusion-exclusion row
    val orders = Tables.orders(s, d)
    val aKeys = orders.where(col("o_orderdate") < lit("1996-01-01"))
      .select(col("o_custkey").as("k"))
    val bKeys = orders.where(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select(col("o_custkey").as("k"))
    val a = sketchOf("buyers_1995", aKeys)
    val b = sketchOf("buyers_1996", bKeys)
    val u = sketchOf("union", aKeys.unionAll(bKeys))
    val inter = a.select(col("est_distinct").as("ea"), col("exact_distinct").as("xa"))
      .crossJoin(b.select(col("est_distinct").as("eb"), col("exact_distinct").as("xb")))
      .crossJoin(u.select(col("est_distinct").as("eu"), col("exact_distinct").as("xu")))
      .select(lit("intersection").as("metric"),
        (col("ea") + col("eb") - col("eu")).as("est_distinct"),
        (col("xa") + col("xb") - col("xu")).as("exact_distinct"))
    a.unionAll(b).unionAll(u).unionAll(inter).orderBy(col("metric"))
  }

  val kmvDistinctSql: String = {
    def h(e: String) =
      s"CAST('0x' || substr(md5('kmv|' || CAST($e AS VARCHAR)), 1, 15) AS BIGINT)"
    s"""WITH ah AS (SELECT DISTINCT ${h("o_custkey")} AS h FROM orders
       |   WHERE o_orderdate < '1996-01-01'),
       | bh AS (SELECT DISTINCT ${h("o_custkey")} AS h FROM orders
       |   WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'),
       | uh AS (SELECT h FROM ah UNION SELECT h FROM bh),
       | ac AS (SELECT count(*) AS n, max(h) AS hk FROM (SELECT h FROM ah ORDER BY h LIMIT 256) t),
       | bc AS (SELECT count(*) AS n, max(h) AS hk FROM (SELECT h FROM bh ORDER BY h LIMIT 256) t),
       | uc AS (SELECT count(*) AS n, max(h) AS hk FROM (SELECT h FROM uh ORDER BY h LIMIT 256) t),
       | ae AS (SELECT CASE WHEN n < 256 THEN n ELSE CAST((CAST(255 AS HUGEINT) * 1152921504606846976) // hk AS BIGINT) END AS est FROM ac),
       | be AS (SELECT CASE WHEN n < 256 THEN n ELSE CAST((CAST(255 AS HUGEINT) * 1152921504606846976) // hk AS BIGINT) END AS est FROM bc),
       | ue AS (SELECT CASE WHEN n < 256 THEN n ELSE CAST((CAST(255 AS HUGEINT) * 1152921504606846976) // hk AS BIGINT) END AS est FROM uc),
       | ax AS (SELECT count(DISTINCT o_custkey) AS x FROM orders
       |   WHERE o_orderdate < '1996-01-01'),
       | bx AS (SELECT count(DISTINCT o_custkey) AS x FROM orders
       |   WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'),
       | ux AS (SELECT count(DISTINCT o_custkey) AS x FROM orders
       |   WHERE o_orderdate < '1997-01-01')
       |SELECT * FROM (
       |  SELECT 'buyers_1995' AS metric, (SELECT est FROM ae) AS est_distinct, (SELECT x FROM ax) AS exact_distinct
       |  UNION ALL
       |  SELECT 'buyers_1996', (SELECT est FROM be), (SELECT x FROM bx)
       |  UNION ALL
       |  SELECT 'union', (SELECT est FROM ue), (SELECT x FROM ux)
       |  UNION ALL
       |  SELECT 'intersection',
       |    (SELECT est FROM ae) + (SELECT est FROM be) - (SELECT est FROM ue),
       |    (SELECT x FROM ax) + (SELECT x FROM bx) - (SELECT x FROM ux)
       |) ORDER BY metric""".stripMargin
  }

  /** q183 — SKETCH-MODE TABLE PROFILER: q129's documented 100 TB knob
    * shipped as a first-class operator. q129's exact profiler plans ONE
    * Expand for its multi-countDistinct — the right demo at gate scale,
    * but Expand multiplies the scan by the distinct-column count; the
    * production ANALYZE at 100 TB swaps the exact distincts for
    * sketches. Here: per column a [[graft.functions.KmvAgg]] bottom-256
    * sketch (all four sketches + null counters ride ONE aggregate over
    * ONE scan — no Expand, state = 4×256 longs), estimates by q101's
    * exact-below-k / (k−1)·2⁶⁰ div h_k rule. The md5 hash makes every
    * sketch deterministic, so unlike a production HLL profile the gate
    * replays estimate VALUES bit-for-bit in DuckDB (`ORDER BY h LIMIT
    * 256` per column), not just their error envelopes.
    *
    * Column mix exercises both estimator regimes: o_orderkey saturates
    * the sketch (est path), o_orderstatus/o_orderpriority stay below k
    * (exact path), o_custkey sits near the boundary at gate SF. */
  def tableProfileKmv(s: SparkSession, d: String): DataFrame = {
    import graft.functions.KmvAgg.kmvSketch
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val aggExprs = count(lit(1)).as("n_rows") +: cols.flatMap { n =>
      val c = col(n).cast("string")
      Seq(kmvSketch(kmvHash(c), KmvK).as(s"arr_$n"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls_$n"))
    }
    def estOf(n: String): Column =
      when(size(col(s"arr_$n")) < KmvK, size(col(s"arr_$n")).cast("long"))
        .otherwise(expr(
          s"CAST((CAST(${KmvK - 1} AS DECIMAL(38,0)) * CAST(1152921504606846976 AS DECIMAL(38,0))) div element_at(arr_$n, $KmvK) AS BIGINT)"))
    Tables.orders(s, d).agg(aggExprs.head, aggExprs.tail: _*)
      .select(col("n_rows"), explode(array(cols.map(n =>
        struct(lit(n).as("col_name"), col(s"nulls_$n").as("n_nulls"),
          estOf(n).as("n_distinct_est"))): _*)).as("r"))
      .select(col("r.col_name").as("col_name"), col("n_rows"),
        col("r.n_nulls").as("n_nulls"),
        col("r.n_distinct_est").as("n_distinct_est"))
      .orderBy(col("col_name"))
  }

  /** Oracle for [[tableProfileKmv]]: per column the distinct-hash
    * bottom-256 and the q101 estimator rule, replayed exactly. */
  val tableProfileKmvSql: String = {
    def h(e: String) =
      s"CAST('0x' || substr(md5('kmv|' || CAST($e AS VARCHAR)), 1, 15) AS BIGINT)"
    def colCtes(n: String) =
      s"""h_$n AS (SELECT DISTINCT ${h(n)} AS h FROM orders
         |   WHERE $n IS NOT NULL),
         | b_$n AS (SELECT count(*) AS n, max(h) AS hk
         |   FROM (SELECT h FROM h_$n ORDER BY h LIMIT 256) t),
         | e_$n AS (SELECT CASE WHEN n < 256 THEN n
         |   ELSE CAST((CAST(255 AS HUGEINT) * 1152921504606846976) // hk
         |        AS BIGINT) END AS est FROM b_$n),
         | z_$n AS (SELECT CAST(count(*) - count($n) AS BIGINT) AS nn
         |   FROM orders)""".stripMargin
    def row(n: String) =
      s"""SELECT '$n' AS col_name, (SELECT n FROM tot) AS n_rows,
         |  (SELECT nn FROM z_$n) AS n_nulls,
         |  CAST((SELECT est FROM e_$n) AS BIGINT) AS n_distinct_est""".stripMargin
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    s"""WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
       | ${cols.map(colCtes).mkString(",\n ")}
       |SELECT * FROM (
       |  ${cols.map(row).mkString("\n  UNION ALL\n  ")}
       |) ORDER BY col_name""".stripMargin
  }

  /** q189 — INCREMENTAL PROFILE MAINTENANCE (sketch-merge refresh):
    * q137 maintains count/sum/min/max rollups incrementally; the
    * distinct-count column of a profile was the one statistic that
    * still forced a full rescan — KMV closes it, because bottom-k
    * sketches merge EXACTLY: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    * bottom-k(B)) (every global minimum is a minimum of its side).
    * Yesterday's per-column sketches are a persisted fingerprint-keyed
    * artifact; today's delta (o_orderkey % 10 = 0) is sketched ALONE;
    * the merge re-sketches the ≤ 2k persisted minima — history is
    * never rescanned, refresh cost O(delta). The face emits the merged
    * estimate NEXT TO the direct full-scan estimate, so their
    * oracle-checked equality machine-checks the merge theorem every
    * run (the q125/q137 convention).
    *
    * Scale: delta scan + a |cols|×k-row union — the nightly ANALYZE
    * refresh at 100 TB reads only the day's partition. */
  def profileKmvIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.functions.KmvAgg.kmvSketch
    val cols = Seq("o_custkey", "o_orderstatus")
    val orders = Tables.orders(s, d)
    def sketchRows(df: DataFrame): DataFrame = {
      val aggs = cols.map(n =>
        kmvSketch(kmvHash(col(n).cast("string")), KmvK).as(s"arr_$n"))
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(n =>
          struct(lit(n).as("col_name"), col(s"arr_$n").as("arr"))): _*)).as("r"))
        .select(col("r.col_name").as("col_name"), col("r.arr").as("arr"))
    }
    // yesterday's sketches: persisted once, keyed on source content +
    // a format version (r14 advice: the sketch layout is coupled to
    // KmvAgg's code — bump the tag on any schema/semantics change so a
    // stale committed artifact can't serve old-format rows)
    val art = new java.io.File(
      s"target/tmp/kmvprof_v2_${Tables.sourceFingerprint(d, "orders")}")
    this.synchronized {
      if (!new java.io.File(art, "_OK").exists()) {
        scala.reflect.io.Path(art).deleteRecursively()
        sketchRows(orders.where(col("o_orderkey") % 10 =!= 0))
          .coalesce(1).write.mode("overwrite").parquet(s"${art.getPath}/sk")
        new java.io.File(art, "_OK").createNewFile()
      }
    }
    val hist = s.read.parquet(s"${art.getPath}/sk")
    val delta = sketchRows(orders.where(col("o_orderkey") % 10 === 0))
    def estOf(arr: Column): Column =
      when(size(arr) < KmvK, size(arr).cast("long"))
        .otherwise(expr(
          s"CAST((CAST(${KmvK - 1} AS DECIMAL(38,0)) * CAST(1152921504606846976 AS DECIMAL(38,0))) div element_at(arr, $KmvK) AS BIGINT)"))
    // merge = re-sketch the union of persisted minima (≤ 2k rows/col)
    val merged = hist.unionAll(delta)
      .select(col("col_name"), explode(col("arr")).as("h"))
      .groupBy(col("col_name"))
      .agg(kmvSketch(col("h"), KmvK).as("arr"))
      .select(col("col_name"), estOf(col("arr")).as("est_merged"))
    val full = sketchRows(orders)
      .select(col("col_name"), estOf(col("arr")).as("est_full"))
    merged.join(full, Seq("col_name"))
      .select(col("col_name"), col("est_merged"), col("est_full"),
        (col("est_merged") === col("est_full")).as("merge_exact"))
      .orderBy(col("col_name"))
  }

  /** Oracle for [[profileKmvIncremental]]: per column bottom-256 of
    * (bottom-256 of history ∪ bottom-256 of delta) vs the direct
    * bottom-256, both estimated by the q101 rule — equal by the
    * bottom-k merge theorem, and the hash proves it. */
  val profileKmvIncrementalSql: String = {
    def h(e: String) =
      s"CAST('0x' || substr(md5('kmv|' || CAST($e AS VARCHAR)), 1, 15) AS BIGINT)"
    def side(n: String, pred: String, nm: String) =
      s"""$nm AS (SELECT h FROM (
         |   SELECT DISTINCT ${h(n)} AS h FROM orders WHERE $pred)
         |   ORDER BY h LIMIT 256)""".stripMargin
    def colCtes(n: String) =
      s"""${side(n, s"o_orderkey % 10 <> 0", s"hist_$n")},
         | ${side(n, s"o_orderkey % 10 = 0", s"delta_$n")},
         | m_$n AS (SELECT count(*) AS n, max(h) AS hk FROM (
         |   SELECT DISTINCT h FROM (SELECT h FROM hist_$n
         |                           UNION ALL SELECT h FROM delta_$n)
         |   ORDER BY h LIMIT 256) t),
         | f_$n AS (SELECT count(*) AS n, max(h) AS hk FROM (
         |   SELECT DISTINCT ${h(n)} AS h FROM orders
         |   ORDER BY h LIMIT 256) t),
         | em_$n AS (SELECT CASE WHEN n < 256 THEN n
         |   ELSE CAST((CAST(255 AS HUGEINT) * 1152921504606846976) // hk
         |        AS BIGINT) END AS est FROM m_$n),
         | ef_$n AS (SELECT CASE WHEN n < 256 THEN n
         |   ELSE CAST((CAST(255 AS HUGEINT) * 1152921504606846976) // hk
         |        AS BIGINT) END AS est FROM f_$n)""".stripMargin
    def row(n: String) =
      s"""SELECT '$n' AS col_name,
         |  CAST((SELECT est FROM em_$n) AS BIGINT) AS est_merged,
         |  CAST((SELECT est FROM ef_$n) AS BIGINT) AS est_full,
         |  (SELECT est FROM em_$n) = (SELECT est FROM ef_$n) AS merge_exact""".stripMargin
    val cols = Seq("o_custkey", "o_orderstatus")
    s"""WITH ${cols.map(colCtes).mkString(",\n ")}
       |SELECT * FROM (
       |  ${cols.map(row).mkString("\n  UNION ALL\n  ")}
       |) ORDER BY col_name""".stripMargin
  }

  val cmsFrequencyPortableSql: String = {
    def h(keyExpr: String) =
      s"CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || CAST($keyExpr AS VARCHAR)), 1, 15) AS BIGINT) % 2048"
    s"""WITH probes AS (SELECT unnest([1, 2, 3, 4, 5]) AS user_id),
       | rws AS (SELECT unnest([0, 1, 2, 3, 4]) AS j),
       | eh AS (SELECT j, ${h("user_id")} AS bucket
       |        FROM events CROSS JOIN rws),
       | sketch AS (SELECT j, bucket, count(*) AS n FROM eh GROUP BY 1, 2),
       | ph AS (SELECT user_id, j, ${h("user_id")} AS bucket
       |        FROM probes CROSS JOIN rws),
       | est AS (SELECT user_id, CAST(min(coalesce(n, 0)) AS BIGINT) AS est_n
       |         FROM ph LEFT JOIN sketch USING (j, bucket) GROUP BY 1),
       | ex AS (SELECT user_id, count(*) AS exact_n FROM events
       |        WHERE user_id IN (1, 2, 3, 4, 5) GROUP BY 1)
       |SELECT CAST(p.user_id AS BIGINT) AS user_id,
       |  CAST(coalesce(ex.exact_n, 0) AS BIGINT) AS exact_n, est.est_n
       |FROM probes p LEFT JOIN ex USING (user_id) JOIN est USING (user_id)
       |ORDER BY user_id""".stripMargin
  }

  /** Approximate quantiles with a RANK-ERROR contract (q95) — the fourth
    * sketch family (HLL = distinct, CMS = frequency, MinHash =
    * similarity, KLL/GK = quantiles): `percentile_approx` over
    * l_extendedprice at accuracy 1000, the distribution-statistics
    * primitive a 100 TB length/size audit runs instead of an exact
    * sort. The sketch value itself is engine-internal (q14's situation),
    * but its guarantee — returned value's RANK within n/accuracy of the
    * target rank — is exactly checkable: one follow-up scan counts rows
    * ≤ the approx value (an exact integer rank), and the face emits the
    * integer-cross-multiplied within-tolerance flags at 2× the
    * documented bound (the q14 honest-envelope convention; the spec
    * asserts the tight 1× bound on this corpus). The oracle recomputes n
    * and asserts the flags TRUE — a broken sketch moves the rank outside
    * the envelope and reds the hash.
    *
    * Scale: the sketch is ONE map-side-merged aggregate (bounded buffer
    * per partition), the rank check one narrow scan — no sort, no
    * shuffle beyond the two scalar aggs. */
  def approxQuantiles(s: SparkSession, d: String): DataFrame = {
    val acc = 1000
    val price = col("l_extendedprice")
    val li = Tables.lineitem(s, d).select(price)
    val qs = li.agg(percentile_approx(price, array(lit(0.5), lit(0.95)), lit(acc)))
      .head.getSeq[Double](0)
    val (av50, av95) = (qs(0), qs(1))
    val r = li.agg(count(lit(1)),
      sum(when(price <= av50, 1L).otherwise(0L)),
      sum(when(price <= av95, 1L).otherwise(0L))).head
    val (n, r50, r95) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // |rank − p·n| ≤ 2n/acc, cross-multiplied to integers:
    // p=0.50: |2·r·acc − n·acc| ≤ 4n ; p=0.95: |100·r·acc − 95·n·acc| ≤ 200n
    import s.implicits._
    Seq((n,
      math.abs(2L * r50 * acc - n.toLong * acc) <= 4L * n,
      math.abs(100L * r95 * acc - 95L * n * acc) <= 200L * n))
      .toDF("n_rows", "p50_ok", "p95_ok")
  }

  val approxQuantilesSql: String =
    """SELECT count(*) AS n_rows, TRUE AS p50_ok, TRUE AS p95_ok
      |FROM lineitem""".stripMargin

  private val MgCap = 64

  /** q104 — Misra–Gries heavy hitters over the corpus word stream (the
    * 6th sketch family: frequent items). The sketch's counter values are
    * order-dependent (see [[graft.functions.MgAgg]]), so the gate is the
    * q14 contract convention — but backed by a THEOREM, not a
    * probabilistic envelope: after any update/merge order, every word
    * with true frequency > N/(cap+1) has a counter, every counter
    * underestimates, and the underestimate is at most N/(cap+1). The
    * face emits, for exactly the guaranteed-hit set (true freq
    * cross-multiplied against N), the exact count plus the three flag
    * columns; the oracle recomputes the set and N in DuckDB and asserts
    * the flags TRUE. Any contract violation — a missing heavy hitter, an
    * overestimate, a bound breach — reds the hash.
    *
    * Scale: the sketch state is ≤ cap counters per partition, merged
    * map-side, so the shuffle carries tasks×cap entries at any corpus
    * size — the heavy-hitter answer with NO word shuffle. The exact-count
    * leg (needed only to NAME the guaranteed set for the gate) is the
    * q25 hash-agg; a production caller wanting just the sketch skips it. */
  def mgHeavyHitters(s: SparkSession, d: String): DataFrame = {
    import graft.functions.MgAgg.mgSketch
    val toks = Tables.documents(s, d)
      .select(explode(TextAnalysis.words(col("text"))).as("word"))
    val sk = toks
      .agg(mgSketch(col("word"), MgCap).as("sk"), count(lit(1)).as("n_total"))
      .cache() // 1 row: the sketch map + the stream size
    val entries = sk.select(explode(col("sk")).as(Seq("word", "est")))
    val exact = toks.groupBy(col("word")).agg(count(lit(1)).as("n_true"))
    exact.crossJoin(broadcast(sk.select(col("n_total"))))
      .where(col("n_true") * (MgCap + 1) > col("n_total"))
      .join(entries, Seq("word"), "left")
      .select(col("word"), col("n_true"), col("n_total"),
        col("est").isNotNull.as("found"),
        coalesce(col("est") <= col("n_true"), lit(false)).as("le_true"),
        coalesce(col("est") * (MgCap + 1) + col("n_total") >=
          col("n_true") * (MgCap + 1), lit(false)).as("ge_lower"))
      .orderBy(col("n_true").desc, col("word"))
  }

  private val AmsJ = 32

  /** q110 — AMS/tug-of-war join-size estimation (Alon–Matias–Szegedy
    * 1996; the 7th sketch family: second-moment / join cardinality).
    * |A ⋈ B| on key k is Σ_k fA(k)·fB(k); each AMS estimator j keeps
    * Z_j = Σ_rows s_j(key) with a ±1 sign function, and E[Z_A_j·Z_B_j]
    * is exactly the join size. The mean of `AmsJ` independent estimators
    * is the estimate — computed from TWO NARROW SCANS with constant
    * aggregation state, never building a per-key table and never
    * executing the join. That is the planner's cardinality-estimation
    * primitive at 100 TB: the exact answer needs a key shuffle; this
    * needs 32 integer sums per side.
    *
    * Signs come from ONE md5 per row (not one per estimator — the q93
    * k-md5 lesson): the 60-bit house prefix of md5('ams|'||key) supplies
    * `AmsJ` ≤ 60 sign bits via shift-and-mask, so both engines replay
    * every Z_j — and therefore the estimate — bit-for-bit: a hash-exact
    * gate for a randomized estimator, no accuracy contract needed (the
    * estimate's ERROR is spec-asserted; its VALUE is deterministic).
    * The face also computes the exact join size (two bounded per-key
    * aggs + one join on the ~|keys| tables) so the gate row carries
    * both; integer div by AmsJ keeps the mean exact. */
  def amsJoinSize(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    def keyed(pred: Column) = li.where(pred).select(col("l_partkey").as("k"))
    val a = keyed(col("l_shipdate") < lit("1996-01-01"))
    val b = keyed(col("l_shipdate") >= lit("1996-01-01"))
    def sketch(side: DataFrame, prefix: String) = {
      val h = conv(substring(md5(concat(lit("ams|"), col("k").cast("string"))), 1, 15), 16, 10)
        .cast("long")
      // project h ONCE before the agg: inlining it into all 32 sums
      // would lean on codegen CSE to avoid 32 md5s per row (review)
      val zs = (0 until AmsJ).map(j =>
        sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"$prefix$j"))
      side.select(h.as("h")).agg(zs.head, zs.tail: _*)
    }
    val est = sketch(a, "za").crossJoin(sketch(b, "zb"))
      .select((0 until AmsJ).map(j => col(s"za$j") * col(s"zb$j"))
        .reduce(_ + _).as("zsum"))
      // integer div (Column `/` on longs is DOUBLE division). Spark `div`
      // truncates toward zero; DuckDB `//` floors — they diverge on a
      // negative zsum, which per-estimator variance CAN produce for small
      // skewed sides. greatest(zsum, 0) in BOTH engines makes the operand
      // non-negative (where the two semantics agree) and is the right
      // estimate anyway: a join size is never negative.
      .select(expr(s"CAST(greatest(zsum, 0) div $AmsJ AS BIGINT)").as("ams_est"))
    val exact = a.groupBy(col("k")).agg(count(lit(1)).as("fa"))
      .join(b.groupBy(col("k")).agg(count(lit(1)).as("fb")), "k")
      .agg(sum(col("fa") * col("fb")).as("exact_size"))
    exact.crossJoin(est)
      .select(lit("partkey_join").as("metric"), col("exact_size"), col("ams_est"))
  }

  val amsJoinSizeSql: String =
    s"""WITH a AS (SELECT l_partkey AS k FROM lineitem
       |   WHERE l_shipdate < '1996-01-01'),
       | b AS (SELECT l_partkey AS k FROM lineitem
       |   WHERE l_shipdate >= '1996-01-01'),
       | js AS (SELECT unnest(range(0, $AmsJ)) AS j),
       | ah AS (SELECT CAST('0x' || substr(md5('ams|' || CAST(k AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM a),
       | bh AS (SELECT CAST('0x' || substr(md5('ams|' || CAST(k AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM b),
       | az AS (SELECT j, sum(((h >> j) & 1) * 2 - 1) AS z FROM ah, js GROUP BY j),
       | bz AS (SELECT j, sum(((h >> j) & 1) * 2 - 1) AS z FROM bh, js GROUP BY j),
       | est AS (SELECT CAST(greatest(sum(az.z * bz.z), 0) // $AmsJ AS BIGINT) AS ams_est
       |   FROM az JOIN bz USING (j)),
       | ex AS (
       |  SELECT CAST(sum(fa * fb) AS BIGINT) AS exact_size FROM
       |    (SELECT k, count(*) AS fa FROM a GROUP BY k) fa
       |    JOIN (SELECT k, count(*) AS fb FROM b GROUP BY k) fb USING (k))
       |SELECT 'partkey_join' AS metric,
       |  (SELECT exact_size FROM ex) AS exact_size,
       |  (SELECT ams_est FROM est) AS ams_est""".stripMargin

  val mgHeavyHittersSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS word
       |  FROM documents),
       | n AS (SELECT count(*) AS n_total FROM toks),
       | exact AS (SELECT word, count(*) AS n_true FROM toks GROUP BY word)
       |SELECT word, n_true, n_total,
       |  TRUE AS found, TRUE AS le_true, TRUE AS ge_lower
       |FROM exact, n
       |WHERE n_true * ${MgCap + 1} > n_total
       |ORDER BY n_true DESC, word""".stripMargin

  /** q125 — KMV sketch ROLL-UP (the sketch-cube pattern): per-group
    * distinct sketches merged into a global sketch WITHOUT rescanning
    * the data — the property that makes sketches the 100 TB answer to
    * "distincts at every grouping level": compute once at the finest
    * grain, roll up by merging k-long arrays. For bottom-k this is
    * EXACT, not approximate-on-approximate: every one of the k smallest
    * hashes of the union is among the k smallest of its own source, so
    * bottom-k(⋃ bottom-k(Sᵢ)) = bottom-k(⋃ Sᵢ) and the rolled-up
    * sketch — and therefore its estimate — is BIT-IDENTICAL to the
    * direct single-scan global sketch. The face emits both rows, and
    * the oracle recomputes both; their forced equality is the roll-up
    * theorem, machine-checked per run.
    *
    * Merge = explode the per-group arrays and re-aggregate the HASHES
    * through the same [[graft.functions.KmvAgg]] (no re-hashing): the
    * merge input is groups×k longs regardless of data volume. Face:
    * per-priority buyer sketches over orders (5 groups), the roll-up,
    * and the direct global. */
  /** q129 — one-pass TABLE PROFILER (the `ANALYZE`/data-quality shape
    * every ingest pipeline runs before training): per column of orders —
    * row count, null count, EXACT distinct count, numeric min/max,
    * string min/max (dates formatted to an engine-neutral yyyy-MM-dd).
    * Computed as ONE aggregate over ONE scan (all 6×4 measures in a
    * single agg; Catalyst plans the multi-countDistinct as one Expand —
    * still a single pass over the data), then unpivoted to one row per
    * column via an explode of the single result row — no per-column
    * rescans.
    *
    * Scale: the scan is one pass; the Expand multiplies rows by the
    * distinct-agg count before the shuffle, so at 100 TB the knob is
    * swapping `countDistinct` for `approx_count_distinct` (HLL, no
    * Expand) — kept exact here because exactness is what the DuckDB
    * oracle can replay, and the swap is a one-line policy change. */
  def tableProfile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq(
      ("o_orderkey", "num"), ("o_custkey", "num"), ("o_orderstatus", "str"),
      ("o_totalprice", "num"), ("o_orderdate", "date"), ("o_orderpriority", "str"))
    val aggExprs = count(lit(1)).as("n_rows") +: cols.flatMap { case (c, kind) =>
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"))
      val mm = kind match {
        case "num" => Seq(
          min(col(c)).cast("double").as(s"mn_$c"),
          max(col(c)).cast("double").as(s"mx_$c"),
          lit(null).cast("string").as(s"ms_$c"),
          lit(null).cast("string").as(s"xs_$c"))
        case "str" => Seq(
          lit(null).cast("double").as(s"mn_$c"),
          lit(null).cast("double").as(s"mx_$c"),
          min(col(c)).as(s"ms_$c"), max(col(c)).as(s"xs_$c"))
        case _ => Seq( // date: engine-neutral formatting
          lit(null).cast("double").as(s"mn_$c"),
          lit(null).cast("double").as(s"mx_$c"),
          date_format(min(col(c)), "yyyy-MM-dd").as(s"ms_$c"),
          date_format(max(col(c)), "yyyy-MM-dd").as(s"xs_$c"))
      }
      base ++ mm
    }
    val row = Tables.orders(s, d).agg(aggExprs.head, aggExprs.tail: _*)
    val structs = array(cols.map { case (c, _) =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"nn_$c").as("n_null"), col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_num"), col(s"mx_$c").as("max_num"),
        col(s"ms_$c").as("min_str"), col(s"xs_$c").as("max_str"))
    }: _*)
    row.select(explode(structs).as("p")).select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** Oracle for [[tableProfile]]: the same measures per column, one
    * UNION ALL block each (DuckDB may rescan; the Spark side must not). */
  val tableProfileSql: String = {
    val blocks = Seq(
      ("o_orderkey", "num"), ("o_custkey", "num"), ("o_orderstatus", "str"),
      ("o_totalprice", "num"), ("o_orderdate", "date"), ("o_orderpriority", "str"))
      .map { case (c, kind) =>
        val mm = kind match {
          case "num" =>
            s"""CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
               |   CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str""".stripMargin
          case "str" =>
            s"""CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
               |   min($c) AS min_str, max($c) AS max_str""".stripMargin
          case _ =>
            s"""CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
               |   strftime(min($c), '%Y-%m-%d') AS min_str,
               |   strftime(max($c), '%Y-%m-%d') AS max_str""".stripMargin
        }
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |   CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |   CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |   $mm
           | FROM orders""".stripMargin
      }.mkString("\n UNION ALL\n")
    s"""WITH p AS (\n $blocks)\nSELECT * FROM p ORDER BY col_name""".stripMargin
  }

  def kmvRollup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.KmvAgg.kmvSketch
    val est = when(size(col("arr")) < KmvK, size(col("arr")).cast("long"))
      .otherwise(expr(
        s"CAST((CAST(${KmvK - 1} AS DECIMAL(38,0)) * CAST(1152921504606846976 AS DECIMAL(38,0))) div element_at(arr, $KmvK) AS BIGINT)"))
    val keyed = Tables.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        kmvHash(col("o_custkey")).as("h"), col("o_custkey").as("k"))
    // ≤5 rows of k longs feed both the output and the roll-up: collect
    // them into a LocalRelation instead of .cache() — same single scan,
    // but nothing persists past this call (a cached frame here outlived
    // the query and accumulated across gate/bench invocations until the
    // harness's clearCache — r9 advice item)
    val perAgg = keyed.groupBy(col("grp"))
      .agg(kmvSketch(col("h"), KmvK).as("arr"),
        countDistinct(col("k")).as("exact"))
    val per = s.createDataFrame(
      java.util.Arrays.asList(perAgg.collect(): _*), perAgg.schema)
    val globalExact = keyed.agg(countDistinct(col("k"))).head.getLong(0)
    val rolled = per.select(explode(col("arr")).as("h"))
      .agg(kmvSketch(col("h"), KmvK).as("arr"))
      .select(lit("zz_rollup").as("scope"), est.as("est_distinct"),
        lit(globalExact).as("exact_distinct"))
    val direct = keyed.agg(kmvSketch(col("h"), KmvK).as("arr"))
      .select(lit("zz_direct").as("scope"), est.as("est_distinct"),
        lit(globalExact).as("exact_distinct"))
    per.select(col("grp").as("scope"), est.as("est_distinct"),
        col("exact").as("exact_distinct"))
      .unionAll(rolled).unionAll(direct)
      .orderBy(col("scope"))
  }

  val kmvRollupSql: String = {
    def h(e: String) =
      s"CAST('0x' || substr(md5('kmv|' || CAST($e AS VARCHAR)), 1, 15) AS BIGINT)"
    def estOf(src: String) =
      s"""(SELECT CASE WHEN count(*) < $KmvK THEN count(*)
         |  ELSE CAST((CAST(${KmvK - 1} AS HUGEINT) * 1152921504606846976)
         |       // max(hh) AS BIGINT) END
         | FROM (SELECT h AS hh FROM $src ORDER BY h LIMIT $KmvK) t)""".stripMargin
    s"""WITH keyed AS (
       |  SELECT o_orderpriority AS grp, ${h("o_custkey")} AS h, o_custkey AS k
       |  FROM orders),
       | dh AS (SELECT DISTINCT grp, h FROM keyed),
       | ranked AS (
       |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
       |  FROM dh),
       | per_est AS (
       |  SELECT grp,
       |    CASE WHEN count(*) < $KmvK THEN count(*)
       |      ELSE CAST((CAST(${KmvK - 1} AS HUGEINT) * 1152921504606846976)
       |           // max(CASE WHEN rk = $KmvK THEN h END) AS BIGINT) END AS est
       |  FROM ranked WHERE rk <= $KmvK GROUP BY grp),
       | per_exact AS (
       |  SELECT grp, count(DISTINCT k) AS exact FROM keyed GROUP BY grp),
       | sketch_union AS (
       |  SELECT DISTINCT h FROM ranked WHERE rk <= $KmvK),
       | gexact AS (SELECT count(DISTINCT k) AS x FROM keyed),
       | uh AS (SELECT DISTINCT h FROM dh)
       |SELECT e.grp AS scope, CAST(e.est AS BIGINT) AS est_distinct,
       |  CAST(x.exact AS BIGINT) AS exact_distinct
       |FROM per_est e JOIN per_exact x USING (grp)
       |UNION ALL
       |SELECT 'zz_rollup', ${estOf("sketch_union")}, (SELECT x FROM gexact)
       |UNION ALL
       |SELECT 'zz_direct', ${estOf("uh")}, (SELECT x FROM gexact)
       |ORDER BY scope""".stripMargin
  }

  /** q123 — ordered funnel conversion (signup → view → purchase, each
    * step STRICTLY after the previous): the product-analytics primitive
    * every event warehouse runs. Computed in ONE pass: per user ordered
    * by ts, a running `min(case …) over (rows unbounded preceding)`
    * carries "earliest signup so far" past each row, so a view is
    * step-2-valid iff that running min < its ts, and a second running
    * min over valid views qualifies purchases the same way — one
    * shuffle (by user), one sort, two window mins. The formulation
    * everyone writes instead — three chained per-step aggregates, each
    * joined back to the events table — scans and shuffles the corpus
    * three times; the ORACLE runs exactly that 3-join form, so gate
    * equality proves windowed-single-pass ≡ chained-joins (the
    * q93/q100/q117 different-formulation convention).
    *
    * Strict-inequality semantics make ties benign: a same-timestamp
    * signup can enter the running min but never satisfies `< ts`, and
    * min is monotone under the extra rows, so the result is
    * deterministic regardless of intra-timestamp sort order. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = ev
      .withColumn("s1", min(when(col("event_type") === "signup", col("t"))).over(w))
      .withColumn("v_ok",
        col("event_type") === "view" && col("s1") < col("t"))
      .withColumn("s2", min(when(col("v_ok"), col("t"))).over(w))
      .withColumn("p_ok",
        col("event_type") === "purchase" && col("s2") < col("t"))
    val perUser = staged.groupBy(col("user_id"))
      .agg(max(col("event_type") === "signup").as("st1"),
        max(col("v_ok")).as("st2"), max(col("p_ok")).as("st3"))
    perUser.agg(count(lit(1)).as("n_users"),
        sum(col("st1").cast("long")).as("n_signup"),
        sum(col("st2").cast("long")).as("n_view_after"),
        sum(col("st3").cast("long")).as("n_purchase_after"))
      .select(col("n_users"), col("n_signup"), col("n_view_after"),
        col("n_purchase_after"),
        // NULL when the prior step is empty: a conversion out of nothing
        // is undefined, and ANSI div-by-zero would otherwise throw
        when(col("n_signup") > 0,
          expr("(1000000 * n_view_after) div n_signup")).as("conv_view_ppm"),
        when(col("n_view_after") > 0,
          expr("(1000000 * n_purchase_after) div n_view_after"))
          .as("conv_purchase_ppm"))
  }

  val funnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t
      |  FROM events),
      | s1 AS (SELECT user_id, min(t) AS t1 FROM e
      |        WHERE event_type = 'signup' GROUP BY 1),
      | s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN s1 USING (user_id)
      |        WHERE e.event_type = 'view' AND e.t > s1.t1 GROUP BY 1),
      | s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM e JOIN s2 USING (user_id)
      |        WHERE e.event_type = 'purchase' AND e.t > s2.t2 GROUP BY 1)
      |SELECT (SELECT count(DISTINCT user_id) FROM e) AS n_users,
      |  (SELECT count(*) FROM s1) AS n_signup,
      |  (SELECT count(*) FROM s2) AS n_view_after,
      |  (SELECT count(*) FROM s3) AS n_purchase_after,
      |  CASE WHEN (SELECT count(*) FROM s1) > 0 THEN
      |    (1000000 * (SELECT count(*) FROM s2)) // (SELECT count(*) FROM s1)
      |  END AS conv_view_ppm,
      |  CASE WHEN (SELECT count(*) FROM s2) > 0 THEN
      |    (1000000 * (SELECT count(*) FROM s3)) // (SELECT count(*) FROM s2)
      |  END AS conv_purchase_ppm""".stripMargin

  /** q124 — weekly retention cohorts: cohort = a user's first active
    * week, cell (cohort_week, week_delta) = distinct users from that
    * cohort active delta weeks later — the other canonical
    * product-analytics table. Shape: one (user, week) distinct (map-side
    * partial), one per-user min, one co-partitioned join back (both
    * sides user-keyed — no extra shuffle), one bounded agg whose output
    * is |weeks|² cells regardless of event volume. Weeks are integer
    * epoch-week indices (epoch seconds div 604800) — no calendar
    * functions whose week-numbering conventions could diverge between
    * engines. */
  def retentionCohorts(s: SparkSession, d: String): DataFrame = {
    val uw = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_timestamp(ts) div 604800").as("week"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("week")).as("cw"))
    uw.join(cohort, "user_id")
      .groupBy(col("cw").as("cohort_week"),
        (col("week") - col("cw")).as("week_delta"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_delta"))
  }

  val retentionCohortsSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
      |  FROM events),
      | cohort AS (SELECT user_id, min(week) AS cw FROM uw GROUP BY 1)
      |SELECT c.cw AS cohort_week, u.week - c.cw AS week_delta,
      |  count(*) AS n_users
      |FROM uw u JOIN cohort c USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** q132 — time-series GAP-FILL + FORWARD FILL (resample): each user's
    * daily value series densified to EVERY day of the user's active
    * span, missing days carried forward from the last observed day and
    * flagged — the regularization step every downstream time-series
    * consumer (rolling stats, decay models, charting) assumes and no
    * built-in Spark operator provides. Days are integer epoch-day
    * indices (`unix_timestamp div 86400`) — no calendar functions whose
    * conventions could diverge between engines.
    *
    * Shape: one daily aggregate (map-side partial), one per-user span
    * aggregate, `explode(sequence(d0, d1))` to mint the grid — the grid
    * is GENERATED, never shuffled from data — then a co-partitioned
    * (user, day) left join and ONE user-partitioned ordered window for
    * the carry-forward (`last(v, ignoreNulls)` over rows-unbounded-
    * preceding). Scale: output and window width are bounded by
    * users × span-days, never event volume; a pathological multi-year
    * idle user costs rows, not memory (the running-last state is one
    * value). The span's first day always has data, so no leading-null
    * rows exist by construction. */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(sum(col("value")).as("v"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("v").isNull.as("filled"),
        round(last(col("v"), ignoreNulls = true).over(w), 4).as("value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Oracle for [[gapFill]]: the identical densify-and-carry in DuckDB —
    * `generate_series` grid, left join, `last_value(v IGNORE NULLS)`. */
  val gapFillSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    sum(value) AS v
      |  FROM events GROUP BY 1, 2),
      | grid AS (
      |  SELECT user_id, unnest(generate_series(min(day), max(day))) AS day
      |  FROM daily GROUP BY user_id),
      | j AS (
      |  SELECT g.user_id, g.day, d.v
      |  FROM grid g LEFT JOIN daily d USING (user_id, day))
      |SELECT user_id, day, v IS NULL AS filled,
      |  round(last_value(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value
      |FROM j ORDER BY user_id, day""".stripMargin

  /** q133 — event-sequence TRANSITION MATRIX (the Markov / path-analysis
    * primitive): for every consecutive pair of events in a user's
    * timeline, count (from_type → to_type) and normalize each row to a
    * transition probability — "after a view, what happens next?".
    *
    * Shape: ONE user-partitioned ordered window (`lead`) to pair each
    * event with its successor — the same single-shuffle discipline as
    * q123's funnel (vs the self-join form, which re-shuffles the corpus
    * to find successors) — then a map-side-partial count into a
    * |types|² result. The total order (t, event_id) is unique per user
    * (event_id is unique), so ties at the same timestamp are
    * deterministic in both engines. Probabilities are integer ppm via
    * `div` (row_n ≥ 1 by construction — every from-row has ≥ 1
    * transition); the totals join is broadcast (≤ |types| rows).
    * Scale: shuffle = one user-keyed exchange; window state = one
    * look-ahead row; the matrix is bounded by the type vocabulary,
    * never event volume. */
  def pathTransitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val steps = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("t"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val trans = steps
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type")).agg(sum(col("n")).as("row_n"))
    trans.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(1000000 * n) div row_n").as("p_ppm"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Oracle for [[pathTransitions]]: same lead-window pairing in DuckDB. */
  val pathTransitionsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
      |    event_type
      |  FROM events),
      | nx AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id)
      |      AS to_type
      |  FROM e),
      | tr AS (SELECT from_type, to_type, count(*) AS n FROM nx
      |        WHERE to_type IS NOT NULL GROUP BY 1, 2),
      | tot AS (SELECT from_type, sum(n) AS row_n FROM tr GROUP BY 1)
      |SELECT t.from_type, t.to_type, t.n,
      |  CAST((1000000 * t.n) // o.row_n AS BIGINT) AS p_ppm
      |FROM tr t JOIN tot o USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** q134 — MULTI-TOUCH ATTRIBUTION (first-touch / last-touch / linear):
    * each purchase's value is credited to the touch events (signup,
    * view) that preceded it within a 7-day lookback — under all three
    * standard models at once — and rolled up per (model, touch_type):
    * the marketing-analytics table every event warehouse serves.
    *
    * Shape: the purchase×touch pairing is [[Temporal.rangeJoin]] — the
    * bucketed EQUI-join (key, time-bucket) with the interval predicate
    * inside the join, NOT a per-user cross product — so candidate
    * volume is bounded by per-user activity density within the
    * lookback, the same scale argument as q46. Ranks and counts come
    * from one (user, purchase)-partitioned window pass; models fan out
    * by a 3-element generated `explode` (no rescans) into a bounded
    * (3 × |touch types|) aggregate. Time compares at ms precision on
    * BOTH sides (rangeJoin buckets on `unix_millis`), strict `<` at the
    * purchase instant; (tt, t_id) makes first/last ranks deterministic
    * under ties. Zero-credit rows from the first/last models add
    * exactly 0.0 to their sums — emitting them keeps the plan one pass
    * with no per-model filter. */
  def attribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val lookbackMs = 7L * 86400 * 1000
    // shift the purchase ts back by the lookback so rangeJoin's
    // [t0, t0 + window) lands on [pt − lookback, pt) — inclusive at the
    // window start, strict before the purchase itself
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("value"),
        (col("ts") - expr("INTERVAL 7 DAY")).as("ts"))
    val touches = ev.where(col("event_type").isin("signup", "view"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("touch_type"), col("ts"))
    val pairs = Temporal.rangeJoin(purchases, touches, "user_id", "ts",
      windowMs = lookbackMs, bucketMs = lookbackMs)
    val byPurchase = Window.partitionBy(col("user_id"), col("p_id"))
    val ranked = pairs
      .withColumn("n", count(lit(1)).over(byPurchase))
      .withColumn("rf", row_number().over(
        byPurchase.orderBy(col("_rt"), col("t_id"))))
      .withColumn("rl", row_number().over(
        byPurchase.orderBy(col("_rt").desc, col("t_id").desc)))
    ranked
      .select(col("touch_type"), explode(array(
        struct(lit("first_touch").as("model"),
          when(col("rf") === 1, col("value")).otherwise(lit(0.0)).as("credit")),
        struct(lit("last_touch").as("model"),
          when(col("rl") === 1, col("value")).otherwise(lit(0.0)).as("credit")),
        struct(lit("linear").as("model"),
          (col("value") / col("n")).as("credit")))).as("mc"))
      .groupBy(col("mc.model").as("model"), col("touch_type"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("mc.credit")), 4).as("credit"))
      .orderBy(col("model"), col("touch_type"))
  }

  /** Oracle for [[attribution]]: the plain theta-join + rank replay
    * DuckDB can afford at verify SF (the engine plan stays the bucketed
    * equi-join — the q46 convention). */
  val attributionSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS t, event_type, value
      |  FROM events),
      | p AS (SELECT user_id, event_id AS p_id, t AS pt, value FROM e
      |       WHERE event_type = 'purchase'),
      | tc AS (SELECT user_id, event_id AS t_id, t AS tt,
      |          event_type AS touch_type FROM e
      |        WHERE event_type IN ('signup', 'view')),
      | pairs AS (
      |  SELECT p.user_id, p.p_id, p.value, tc.t_id, tc.tt, tc.touch_type
      |  FROM p JOIN tc ON p.user_id = tc.user_id
      |    AND tc.tt < p.pt AND tc.tt >= p.pt - 604800000),
      | ranked AS (
      |  SELECT *, count(*) OVER (PARTITION BY user_id, p_id) AS n,
      |    row_number() OVER (PARTITION BY user_id, p_id
      |                       ORDER BY tt, t_id) AS rf,
      |    row_number() OVER (PARTITION BY user_id, p_id
      |                       ORDER BY tt DESC, t_id DESC) AS rl
      |  FROM pairs),
      | credits AS (
      |  SELECT 'first_touch' AS model, touch_type,
      |    CASE WHEN rf = 1 THEN value ELSE 0.0 END AS credit FROM ranked
      |  UNION ALL
      |  SELECT 'last_touch', touch_type,
      |    CASE WHEN rl = 1 THEN value ELSE 0.0 END FROM ranked
      |  UNION ALL
      |  SELECT 'linear', touch_type, value / n FROM ranked)
      |SELECT model, touch_type, count(*) AS n_pairs,
      |  round(sum(credit), 4) AS credit
      |FROM credits GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q137 — INCREMENTAL AGGREGATE MAINTENANCE (the materialized-view /
    * rollup-refresh shape): yesterday's per-group aggregate table is
    * PERSISTED as a parquet artifact; today's delta batch is aggregated
    * alone and MERGED with the read-back artifact — history is never
    * rescanned. The face emits the merged row AND the full-recompute
    * row per group (the q125 both-rows convention): their equality —
    * hash-checked through the oracle, which replays both paths — is
    * the aggregate-merge theorem (count/sum/min/max are mergeable;
    * this is exactly why production rollups restrict themselves to
    * algebraic aggregates — a countDistinct here would need q101's
    * sketches), and the artifact leg proves the parquet round-trip
    * lossless (the q126/q127 convention).
    *
    * Shape: merge = union of two GROUP-SIZED partial tables + one
    * re-aggregate — the delta scan is the only data-sized work per
    * refresh. At 100 TB the artifact is |groups| rows; the refresh
    * cost is O(delta), independent of history size. */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val base = {
      val dir = new java.io.File("target/tmp/incr_q137")
      scala.reflect.io.Path(dir).deleteRecursively()
      dir.getPath
    }
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"))
    def aggOf(df: DataFrame): DataFrame = df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
    // "yesterday": aggregate the history once and persist the rollup
    aggOf(ev.where(col("event_id") % 5 =!= 0))
      .write.mode("overwrite").parquet(s"$base/agg")
    val hist = s.read.parquet(s"$base/agg")
    // "today": aggregate ONLY the delta, merge with the artifact
    val delta = aggOf(ev.where(col("event_id") % 5 === 0))
    val merged = hist.unionByName(delta).groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
    val direct = aggOf(ev)
    def shape(df: DataFrame, src: String): DataFrame =
      df.select(col("event_type"), lit(src).as("src"), col("n"),
        round(col("sv"), 4).as("sum_value"),
        round(col("mn"), 4).as("min_value"),
        round(col("mx"), 4).as("max_value"))
    shape(merged, "merged").unionByName(shape(direct, "direct"))
      .orderBy(col("event_type"), col("src"))
  }

  /** Oracle for [[incrementalAgg]]: both paths replayed — partials,
    * union-merge, and the direct recompute. */
  val incrementalAggSql: String =
    """WITH hist AS (
      |  SELECT event_type, count(*) AS n, sum(value) AS sv,
      |    min(value) AS mn, max(value) AS mx
      |  FROM events WHERE event_id % 5 <> 0 GROUP BY 1),
      | delta AS (
      |  SELECT event_type, count(*) AS n, sum(value) AS sv,
      |    min(value) AS mn, max(value) AS mx
      |  FROM events WHERE event_id % 5 = 0 GROUP BY 1),
      | u AS (SELECT * FROM hist UNION ALL SELECT * FROM delta),
      | merged AS (
      |  SELECT event_type, 'merged' AS src, sum(n) AS n, sum(sv) AS sv,
      |    min(mn) AS mn, max(mx) AS mx
      |  FROM u GROUP BY 1),
      | direct AS (
      |  SELECT event_type, 'direct' AS src, count(*) AS n,
      |    sum(value) AS sv, min(value) AS mn, max(value) AS mx
      |  FROM events GROUP BY 1),
      | b AS (SELECT * FROM merged UNION ALL SELECT * FROM direct)
      |SELECT event_type, src, CAST(n AS BIGINT) AS n,
      |  round(sv, 4) AS sum_value, round(mn, 4) AS min_value,
      |  round(mx, 4) AS max_value
      |FROM b ORDER BY 1, 2""".stripMargin

  /** q135 — INTEGER-EXACT rolling anomaly detection: each user's daily
    * event count tested against the trailing-week window (7 prior days
    * with data, current day excluded) at 2σ — the ops-monitoring
    * primitive ("did this user's activity spike?"), with the flag
    * decided in EXACT integer arithmetic so the gate hash can check it:
    * |n − μ| > 2σ over window sums (m = frame rows, s1 = Σn, s2 = Σn²)
    * cross-multiplies to (m·n − s1)² > 4·(m·s2 − s1²) — no floating
    * mean, variance, or sqrt whose rounding could diverge between
    * engines at the decision boundary (the q95/q122 convention). The
    * flag is NULL until the frame is full (7 prior rows): a z-test
    * against a partial week is undefined, and both engines' CASE emits
    * the same NULL.
    *
    * Shape: one daily count aggregate (map-side partial), then ONE
    * user-partitioned ordered window carrying three running integer
    * sums over a ROWS frame — state is 7 rows of longs per user,
    * regardless of event volume; counts ≤ ~10⁶/day keep every product
    * (≤ m²·n² ~ 5·10¹⁷) inside a long. Scale: shuffle = one user-keyed
    * exchange; output rows = active (user, day) pairs. */
  def rollingAnomaly(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .select(col("user_id"), col("day"), col("n").as("n_events"),
        col("m").as("window_days"),
        when(col("m") === 7,
          (col("m") * col("n") - col("s1")) * (col("m") * col("n") - col("s1")) >
            lit(4L) * (col("m") * col("s2") - col("s1") * col("s1")))
          .as("anomaly"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Oracle for [[rollingAnomaly]]: identical frame + integer test in
    * DuckDB (its BIGINT sums promote to HUGEINT — same exact values). */
  val rollingAnomalySql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      | win AS (
      |  SELECT user_id, day, n,
      |    count(*) OVER w AS m, sum(n) OVER w AS s1, sum(n * n) OVER w AS s2
      |  FROM daily
      |  WINDOW w AS (PARTITION BY user_id ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT user_id, day, n AS n_events, m AS window_days,
      |  CASE WHEN m = 7 THEN
      |    (m * n - s1) * (m * n - s1) > 4 * (m * s2 - s1 * s1)
      |  END AS anomaly
      |FROM win ORDER BY user_id, day""".stripMargin

  // ---------------------------------------------------------------------
  // q211: ANALYZE-style column statistics (the CBO stats collector)
  // ---------------------------------------------------------------------

  /** Per-column table statistics — what `ANALYZE TABLE ... COMPUTE
    * STATISTICS FOR COLUMNS` feeds a cost-based optimizer: row count,
    * null count, exact NDV, min and max per column. An engine that owns
    * its storage must also own its stats collection; this face is that
    * maintenance job as a query.
    *
    * Shape: one aggregate per column over a COLUMN-PRUNED scan (the
    * ReadSchema audit shows each leg reading exactly one column), then
    * a 4-row union. Exact `countDistinct` is the ANALYZE job shape — a
    * per-column partial-distinct shuffle, linear and map-side combined;
    * at 100 TB production trades exactness for the one-pass HLL sketch
    * (q14 prices the native HLL++, q78 proves the engine-portable
    * variant) — exact here because the oracle replays NDV bit-for-bit.
    * min/max/null-count ride the same scans free. Timestamps surface
    * as epoch seconds; every min/max renders through a BIGINT or
    * VARCHAR cast both engines share. */
  def analyzeColumnStats(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // r16 ADVICE: NDV/counts aggregate on the RAW column (the oracle's
    // count(DISTINCT l_shipdate) is over raw timestamps — aggregating on
    // the second-truncated epoch would diverge if the column ever grew
    // sub-second precision); only min/max RENDER through the epoch cast,
    // which commutes with min/max because unix_timestamp is monotone.
    def stat(name: String, c: Column,
        render: Column => Column = _.cast("string")): DataFrame =
      li.agg(
          count(lit(1)).as("n_rows"),
          count(c).as("n_notnull"),
          countDistinct(c).as("n_distinct"),
          render(min(c)).as("min_s"),
          render(max(c)).as("max_s"))
        .select(lit(name).as("column"), col("n_rows"),
          (col("n_rows") - col("n_notnull")).as("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    Seq(
      stat("l_orderkey", col("l_orderkey")),
      stat("l_linenumber", col("l_linenumber").cast("long")),
      stat("l_returnflag", col("l_returnflag")),
      stat("l_shipdate_epoch", col("l_shipdate"),
        x => unix_timestamp(x).cast("string")))
      .reduce(_ unionByName _)
      .orderBy(col("column"))
  }

  /** Oracle for [[analyzeColumnStats]]: the same four per-column
    * aggregates in DuckDB, unioned. */
  val analyzeColumnStatsSql: String =
    """SELECT * FROM (
      |  SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
      |    count(*) - count(l_orderkey) AS n_null,
      |    count(DISTINCT l_orderkey) AS n_distinct,
      |    CAST(min(l_orderkey) AS VARCHAR) AS min_s,
      |    CAST(max(l_orderkey) AS VARCHAR) AS max_s
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_linenumber', count(*), count(*) - count(l_linenumber),
      |    count(DISTINCT l_linenumber),
      |    CAST(CAST(min(l_linenumber) AS BIGINT) AS VARCHAR),
      |    CAST(CAST(max(l_linenumber) AS BIGINT) AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
      |    count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_shipdate_epoch', count(*), count(*) - count(l_shipdate),
      |    count(DISTINCT l_shipdate),
      |    CAST(CAST(floor(epoch(min(l_shipdate))) AS BIGINT) AS VARCHAR),
      |    CAST(CAST(floor(epoch(max(l_shipdate))) AS BIGINT) AS VARCHAR)
      |  FROM lineitem)
      |ORDER BY "column"""".stripMargin
}
