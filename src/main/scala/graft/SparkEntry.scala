package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a `queries` entry; SQL-expressible
  * ones also register matching DuckDB `oracleSql`. Column names and value
  * rounding are kept identical on both sides (the driver sorts columns by
  * name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> Relational.pricingSummary,
    "q02_offset_scan" -> Relational.offsetScan,
    "q03_revenue_by_nation" -> Relational.revenueByNation,
    "q04_window_top_orders" -> Relational.windowTopOrders,
    "q05_top_revenue_parts" -> Relational.topRevenueParts,
    "q06_setops_customers" -> Relational.setOpsCustomers,
    "q07_rollup_pricing" -> Relational.rollupPricing,
    "q08_distinct_customers" -> Relational.distinctCustomers,
    "q09_json_props" -> Relational.jsonProps,
    "q10_event_windows" -> Relational.eventTumblingWindows
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.pricingSummarySql,
    "q02_offset_scan" -> Relational.offsetScanSql,
    "q03_revenue_by_nation" -> Relational.revenueByNationSql,
    "q04_window_top_orders" -> Relational.windowTopOrdersSql,
    "q05_top_revenue_parts" -> Relational.topRevenuePartsSql,
    "q06_setops_customers" -> Relational.setOpsCustomersSql,
    "q07_rollup_pricing" -> Relational.rollupPricingSql,
    "q08_distinct_customers" -> Relational.distinctCustomersSql,
    "q09_json_props" -> Relational.jsonPropsSql,
    "q10_event_windows" -> Relational.eventTumblingWindowsSql
  )
}
