package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics — the centrality family a curation pipeline
  * uses to rank hosts/domains before sampling (the "rank the web graph,
  * keep the reputable tail" step of CCNet/RefinedWeb-style corpus
  * construction). Complements the one-shot connected-components operator
  * (q38 dup clustering) with a fixed-iteration-count PageRank.
  *
  * Everything is INTEGER-EXACT: ranks are scaled by 1e6 and every step
  * uses integer division (`div`), so there is no float anywhere and an
  * independent engine replays the full iteration bit-for-bit — the same
  * design rule as the q94 integer Lloyd iterations.
  */
object Graph {

  /** `iters` rounds of PageRank over a directed edge list (src, dst),
    * damping 0.85, all arithmetic in scaled integers:
    *
    *   rank_0(v)   = 1_000_000
    *   rank_{i+1}(v) = 150_000 + (85 * Σ_{u→v} (rank_i(u) div outdeg(u))) div 100
    *
    * Every node must appear as a src (undirected graphs: feed both edge
    * directions), which also rules out dangling nodes.
    *
    * Scale: the canonical distributed PageRank shape — outdeg is joined
    * into the edge list ONCE (cached; at cluster scale this is the
    * persisted adjacency), then each iteration is exactly one shuffle
    * join (edges ⋈ ranks on src) plus one map-side-combinable hash
    * aggregation on dst. Cost is linear in |E| per iteration with a
    * FIXED iteration count — no driver-side loop over data, no growing
    * lineage (each iteration's plan builds on a ~|V|-row DataFrame).
    * Skewed in-degree (the hub problem) lands in the hash-agg, which
    * partial-aggregates map-side — not in a sort. */
  def pageRankInt(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, "src").persist()
    val r0 = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    val rN = (1 to iters).foldLeft(r0) { (r, _) =>
      adj.join(r, adj("src") === r("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div deg")).as("c"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * c) div 100")).as("r"))
    }
    rN
  }

  /** Gate face (q98): PageRank over the bipartite customer↔supplier
    * purchase graph (distinct (o_custkey, l_suppkey) pairs from
    * orders ⋈ lineitem, both directions), 3 iterations. Suppliers with
    * broad customer bases rank high — the host-reputation signal.
    * Output: every node's exact integer rank after round 3. */
  def pageRankGate(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey").cast("string")).as("c"),
        concat(lit("s:"), col("l_suppkey").cast("string")).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
    pageRankInt(edges, iters = 3)
      .select(col("node"), col("r").as("rank3"))
      .orderBy(col("node"))
  }

  /** DuckDB replays the exact integer iteration: `//` (floor division)
    * agrees with Spark's `div` on the all-positive ranks here; the final
    * CAST collapses DuckDB's HUGEINT sum back to BIGINT. */
  val pageRankSql: String =
    """WITH e0 AS (
      |  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
      |                  's:' || CAST(l_suppkey AS VARCHAR) AS s
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      | edges AS (SELECT c AS src, s AS dst FROM e0
      |           UNION ALL SELECT s AS src, c AS dst FROM e0),
      | deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      | r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
      | r1 AS (SELECT e.dst AS node,
      |          CAST(150000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
      |        FROM edges e JOIN r0 r ON e.src = r.node
      |                     JOIN deg d ON e.src = d.src GROUP BY 1),
      | r2 AS (SELECT e.dst AS node,
      |          CAST(150000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
      |        FROM edges e JOIN r1 r ON e.src = r.node
      |                     JOIN deg d ON e.src = d.src GROUP BY 1),
      | r3 AS (SELECT e.dst AS node,
      |          CAST(150000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
      |        FROM edges e JOIN r2 r ON e.src = r.node
      |                     JOIN deg d ON e.src = d.src GROUP BY 1)
      |SELECT node, r AS rank3 FROM r3 ORDER BY node""".stripMargin
}
