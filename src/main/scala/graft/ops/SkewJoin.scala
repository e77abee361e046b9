package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md scale checklist: "skewed
  * keys → salting or AQE skew-join"). AQE splits oversized shuffle
  * partitions after the fact; salting prevents them from forming: the
  * heavy (fact) side gets a deterministic salt in [0, n) per row, the
  * light side is replicated n ways, and the join key becomes
  * (key, salt) — every hot key now spreads over n reducers.
  *
  * Replication multiplies the light side by n, so n stays small (8-32)
  * and the light side should be the smaller input (but too big to
  * broadcast — otherwise just broadcast it).
  */
object SkewJoin {

  /** Inner equi-join of `heavy` and `light` on `key`, salted `n` ways.
    * Row-for-row equivalent to `heavy.join(light, key)`. */
  def saltedJoin(heavy: DataFrame, light: DataFrame, key: String, n: Int): DataFrame = {
    require(n > 0, "salt factor must be positive")
    // deterministic per-row salt: spreads each key's rows across n buckets
    // (uses the row's other columns via xxhash64 over all of them)
    val salted = heavy.withColumn("_salt",
      pmod(xxhash64(heavy.columns.map(col).toIndexedSeq: _*), lit(n)).cast("int"))
    val replicated = light
      .withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key)).drop("_salt")
  }

  /** Two-path variant: broadcast-join only the known hot keys, shuffle-join
    * the long tail, union — the surgical fix when a handful of keys hold
    * most rows and the light side's hot slice fits in memory. */
  def hotKeySplitJoin(heavy: DataFrame, light: DataFrame, key: String,
      hotKeys: Seq[Long]): DataFrame = {
    val isHot: Column = col(key).isin(hotKeys: _*)
    val hot = heavy.where(isHot)
      .join(broadcast(light.where(isHot)), key)
    val tail = heavy.where(!isHot).join(light.where(!isHot), key)
    hot.unionByName(tail)
  }

  /** q79 — the salted join driven end-to-end as a gate query, ORACLE =
    * the plain join (salting is row-for-row equivalent by construction,
    * and the DuckDB oracle proves it on real data, not just the spec's
    * synthetic frame): lineitem (heavy) ⋈ orders (light, too big to
    * broadcast at scale) on the order key, 16 salt buckets, revenue per
    * order priority. */
  def saltedRevenue(s: SparkSession, d: String): DataFrame = {
    val heavy = Tables.lineitem(s, d).select(col("l_orderkey"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val light = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(heavy, light, "l_orderkey", 16)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("rev")), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val saltedRevenueSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q80 — the hot-key split join as a gate query, ORACLE = the plain
    * join: orders (heavy) ⋈ customer on custkey with a declared hot-key
    * list (broadcast slice + shuffled tail, unioned), order value per
    * market segment. */
  def hotKeySplitSpend(s: SparkSession, d: String): DataFrame = {
    val heavy = Tables.orders(s, d)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val light = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    hotKeySplitJoin(heavy, light, "c_custkey", Seq(1L, 2L, 3L))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spend"))
      .orderBy(col("c_mktsegment"))
  }

  val hotKeySplitSpendSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_spend
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
}
