package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
