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

  /** Serializes the scoped AQE-width override in [[pageRankInt]] (r12
    * advice: overlapping scoped-conf calls can interleave so the
    * temporary width outlives both scopes). */
  private val widthLock = new Object

  /** `iters` rounds of PageRank over a directed edge list (src, dst),
    * damping 0.85, all arithmetic in scaled integers:
    *
    *   rank_0(v)   = 1_000_000
    *   rank_{i+1}(v) = 150_000 + (85 * Σ_{u→v} (rank_i(u) div outdeg(u))) div 100
    *
    * Every node must appear as a src (undirected graphs: feed both edge
    * directions), which also rules out dangling nodes.
    *
    * Scale: the canonical distributed PageRank shape, measured into
    * place at sf10 (1.6M nodes, 117M directed edges; GraphDiag is the
    * decomposition tool). The first cut persisted the adjacency
    * unpartitioned and let the planner pick the join, which broadcast
    * ranks at small SF but flipped to sort-merge past the threshold,
    * re-SORTING the cached adjacency every iteration — 352 s at sf10 (116 s final),
    * with the duplicated edge-build lineage (r0's deg recomputed the
    * whole distinct) a second hidden cost. The measured-correct shape:
    *  - the EDGE LIST is the only |E|-sized state, repartitioned by src
    *    ONCE with an explicit partition count and cached in that layout
    *    (an explicit-N repartition atop the cache is what the planner's
    *    EnsureRequirements actually recognizes — a cache topped by a
    *    join reports unknown partitioning and gets re-exchanged);
    *  - deg and r0 derive from the cache CO-PARTITIONED (their groupBy
    *    needs no exchange — verified in the executed plan);
    *  - each round joins rank⋈deg FIRST (a |V|⋈|V| co-partitioned
    *    shuffle-hash join), so the |E|-row cache only ever streams
    *    against a pre-reduced |V|-row build side, then ONE map-side-
    *    combinable hash-agg on dst — the message-passing shuffle
    *    PageRank is defined by. ~10-15 s per round at sf10 vs the naive
    *    plan's whole-graph re-sorts. Skewed in-degree lands in the
    *    partial agg, not a sort. Fixed iteration count, no driver-side
    *    data loop. */
  /** Session-conf-driven width of the edge cache (and the scoped-width
    * floor below): `graft.graph.parts` if set, else the session's
    * shuffle width — a literal here would silently degrade the
    * co-partitioning trick on a cluster configured wider than the dev
    * box. Exposed for the spec that pins exactly that contract. */
  private[graft] def graphParts(conf: org.apache.spark.sql.RuntimeConfig): Int =
    conf.getOption("graft.graph.parts").map(_.toInt)
      .getOrElse(conf.get("spark.sql.shuffle.partitions").toInt)

  /** The ONE |E|-sized state: edge list repartitioned by src at an
    * explicit session-derived count and cached in that layout (an
    * explicit-N repartition atop the cache is what EnsureRequirements
    * actually recognizes). Extracted so the spec can assert the layout
    * directly — [[pageRankInt]]'s checkpointed result no longer carries
    * the repartition exchange in its lineage. */
  private[graft] def edgeCache(edges: DataFrame): DataFrame =
    edges.repartition(graphParts(edges.sparkSession.conf), col("src")).persist()

  /** Router threshold for [[pageRankInt]]'s small-graph fast path, in
    * DIRECTED EDGES: at or below it the cached edge list collects to the
    * driver (≤ ~32 MB of packed-long pairs at the default) and the exact
    * integer recurrence runs as a per-round array sweep; above it the
    * distributed message-passing loop runs. The q112/CC routing
    * discipline — a measured, physical-plan-only decision (both routes
    * emit the identical integer fixpoint; GraphSpec machine-checks them
    * against each other), count-checked BEFORE any collect. Rationale
    * (r17 probe, the CC lesson applied to the other iterative face):
    * each distributed round costs ~0.6-0.8 s of join+agg+checkpoint
    * fixed cost regardless of data — q98's gate-SF graph (1.17M edges)
    * paid ~2.4 s of round machinery for ~0.1 s of arithmetic. */
  private val PrDriverMaxEdges = 1L << 21

  def pageRankInt(edges: DataFrame, iters: Int): DataFrame = {
    // ONE edge build, cached src-partitioned — the only |E|-sized state;
    // deg and r0 derive from the cache co-partitioned (no exchange).
    // The explicit partition COUNT (EnsureRequirements only recognizes
    // the co-partitioning when it is explicit) follows the session:
    // graft.graph.parts if set, else spark.sql.shuffle.partitions — a
    // literal here would silently degrade the whole trick on a real
    // cluster configured wider than the dev box.
    val conf = edges.sparkSession.conf
    val parts = graphParts(conf)
    val e = edgeCache(edges)
    val maxDriver = conf.getOption("graft.graph.driverMaxEdges")
      .map(_.toLong).getOrElse(PrDriverMaxEdges)
    // the count runs off the persisted cache (materializing it up front,
    // which round 1 would otherwise do lazily — no extra pass either way)
    val nEdges = e.count()
    if (nEdges <= maxDriver) return pageRankDriver(e, iters, parts)
    // deg is referenced 4× in the unrolled DAG (r0 + one dd per round);
    // caching the |V|-row table keeps the fused plan from re-aggregating
    // the |E|-row cache each time
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val r0 = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    // fresh aliases per derivation: contrib shares lineage with e (deg is
    // computed from the cache), so name-unique keys avoid self-join
    // ambiguity while aliases keep the partitioning propagating
    val dd = deg.select(col("src").as("dnode"), col("deg"))
    // PER-OPERATOR AQE width override (r11 verdict item 3): the
    // iterative join/agg rounds want a WIDE shuffle start — q98 was the
    // ONE query the r10 flat-256 session width helped (3.37 s vs 4.49
    // at session width; the r12 A/B reproduced ~0.7 s warm) — but
    // re-widening the whole session re-taxes the LSH family ~2× (the
    // r11 CcAB decomposition). A scoped conf set around a LAZY plan is
    // a known no-op here (execution happens after the restore), so each
    // round is made EAGER with localCheckpoint: the iteration executes
    // inside the scoped width, its |V|-row result is materialized (also
    // truncating the unrolled lineage — standard iterative-graph
    // hygiene), and the restored conf governs only the cheap final
    // projection. The override never NARROWS: at decade SFs, where the
    // input-volume rule already starts at ≥256, it is a no-op.
    // r12 advice: the scoped override is serialized under a module lock
    // (two overlapping pageRankInt calls could interleave set/restore so
    // the temporary width outlived both scopes) and restored
    // COMPARE-AND-SET — only undone if the key still holds OUR value, so
    // a concurrent writer's setting is never clobbered. A concurrent
    // UNRELATED query in the same session still plans under the widened
    // value for the duration (session confs are global); that is the
    // documented cost of the per-operator width trick.
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val rN = Graph.widthLock.synchronized {
    val prev = conf.getOption(key)
    val mine = math.max(256, prev.map(_.toInt).getOrElse(parts)).toString
    conf.set(key, mine)
      try {
        (1 to iters).foldLeft(r0) { (r, _) =>
          // per-node contribution FIRST: a |V|⋈|V| co-partitioned join, so
          // the |E|-row side only ever joins a pre-reduced |V|-row build side
          val contrib = r.join(dd.hint("shuffle_hash"), col("node") === col("dnode"))
            .select(col("dnode").as("csrc"), expr("r div deg").as("cr"))
          e.join(contrib.hint("shuffle_hash"), col("src") === col("csrc"))
            .groupBy(col("dst"))
            .agg(sum(col("cr")).as("c"))
            .select(col("dst").as("node"),
              (lit(150000L) + expr("(85 * c) div 100")).as("r"))
            .localCheckpoint(true)
        }
      } finally {
        if (conf.getOption(key).contains(mine)) prev match {
          case Some(v) => conf.set(key, v)
          case None => conf.unset(key)
        }
      }
    }
    // the checkpointed rN no longer references e/deg lineage — release
    // the |E|-sized cache instead of leaking it across gate queries
    e.unpersist(); deg.unpersist()
    rN
  }

  /** Small-graph route: the identical integer recurrence as a driver
    * array sweep over the collected edge list (bounded by the router's
    * count check — the q197-FFD/q203-anchor bounded-driver contract).
    * Faithful to the distributed loop row for row: deg counts EVERY edge
    * row (no dedup), contributions come only from nodes present in the
    * previous round's rank table (a node that received no in-edges drops
    * out, exactly as the groupBy(dst) drops it), and the sum is integer
    * so accumulation order cannot matter. Node type stays whatever the
    * caller's src/dst columns are (q98 packs longs, the specs use
    * strings) — keys are compared as JVM values, same equality the
    * shuffle hash uses. The result distributes via parallelize rather
    * than a LocalRelation literal so a threshold-sized |V| never bloats
    * the plan. */
  private def pageRankDriver(e: DataFrame, iters: Int, parts: Int): DataFrame = {
    val s = e.sparkSession
    val rows = e.collect()
    e.unpersist()
    val deg = new java.util.HashMap[Any, Long](rows.length)
    rows.foreach(r => deg.merge(r.get(0), 1L, (a, b) => a + b))
    var rank = new java.util.HashMap[Any, Long](deg.size())
    deg.keySet().forEach(n => rank.put(n, 1000000L))
    for (_ <- 1 to iters) {
      val next = new java.util.HashMap[Any, Long](deg.size())
      rows.foreach { r =>
        val u = r.get(0)
        val ru = rank.getOrDefault(u, 0L)
        if (ru != 0L) // ranks are always > 0; 0 = node absent this round
          next.merge(r.get(1), ru / deg.get(u), (a, b) => a + b)
      }
      next.replaceAll((_, c) => 150000L + (85L * c) / 100L)
      rank = next
    }
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](rank.size())
    rank.forEach((n, r) => out += org.apache.spark.sql.Row(n, r))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", e.schema("src").dataType),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.LongType, nullable = false)))
    s.createDataFrame(
      s.sparkContext.parallelize(out.toSeq, math.max(1, math.min(parts, out.size))),
      schema)
  }

  /** Gate face (q98): PageRank over the bipartite customer↔supplier
    * purchase graph (distinct (o_custkey, l_suppkey) pairs from
    * orders ⋈ lineitem, both directions), 3 iterations. Suppliers with
    * broad customer bases rank high — the host-reputation signal.
    * Output: every node's exact integer rank after round 3. */
  def pageRankGate(s: SparkSession, d: String): DataFrame = {
    // node ids stay PACKED LONGS (cust*2 / supp*2+1) through every
    // shuffle, the cache, and all three iterations — measured at sf10,
    // the string-keyed edge build dominated the wall (189 of 270 s:
    // 60M+117M rows of ~50-byte "c:123" pairs through distinct +
    // repartition + cache); longs cut the shuffled/cached bytes ~5× and
    // hash/compare cost with them. The 1.6M OUTPUT rows get their
    // display labels after the last iteration, where the cost is |V|.
    val pairs = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
    pageRankInt(edges, iters = 3)
      .select(
        when(col("node") % 2 === 0, concat(lit("c:"), expr("node div 2").cast("string")))
          .otherwise(concat(lit("s:"), expr("(node - 1) div 2").cast("string")))
          .as("node"),
        col("r").as("rank3"))
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
