package graft

import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the iterative-graph family (q98): the integer PageRank
  * recurrence against a hand-computed fixture, and the structural
  * invariants (node retention, layout independence) the oracle data
  * can't isolate. */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-graph-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("pageRankInt: hand-computed 2-iteration fixture on a 4-node bipartite graph") {
    val s = spark
    import s.implicits._
    // c1-{s1,s2}, c2-{s1}, bidirectional; deg: c1=2, c2=1, s1=2, s2=1
    val pairs = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // r1: hubs (c1, s1) 1,425,000; leaves 575,000
    // r2(s1) = 150000 + 85*((1425000 div 2) + 575000) div 100 = 1,244,375
    // r2(s2) = 150000 + 85*(1425000 div 2) div 100 = 755,625 (symmetry: c-side equal)
    assert(got == Map("c1" -> 1244375L, "c2" -> 755625L,
      "s1" -> 1244375L, "s2" -> 755625L))
  }

  test("pageRankInt: every src node keeps a rank, ranks positive, layout-independent") {
    val s = spark
    import s.implicits._
    val pairs = (1 to 60).map(i => (s"a${i % 7}", s"b${i % 11}")).distinct
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    def run(parts: Int): Seq[(String, Long)] =
      Graph.pageRankInt(edges.repartition(parts), iters = 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val a = run(1)
    assert(a.map(_._1) == (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted)
    assert(a.forall(_._2 > 0))
    assert(a == run(9))
  }

  test("pageRankInt: driver route ≡ distributed loop on randomized graphs") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random multigraph with asymmetric degrees and
    // nodes that appear only as dst in some rounds (the drop-out rule)
    val pairs = (1 to 400).map { i =>
      val a = (i * 2654435761L) % 37; val b = (i * 40503L) % 53 + 37
      (s"n$a", s"n$b")
    }
    val edges = (pairs ++ pairs.take(150).map(_.swap)).toDF("src", "dst")
    def run(): Map[String, Long] =
      Graph.pageRankInt(edges, iters = 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaDriver = run() // default threshold: driver route
    val viaStar = try {
      spark.conf.set("graft.graph.driverMaxEdges", "0") // force distributed
      run()
    } finally spark.conf.unset("graft.graph.driverMaxEdges")
    assert(viaDriver == viaStar,
      "both routes must emit the identical integer fixpoint")
    assert(viaDriver.nonEmpty && viaDriver.values.forall(_ > 0))
  }

  test("pageRankInt: edge-cache partition count follows the session conf, not a literal") {
    val s = spark
    import s.implicits._
    val pairs = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    try {
      spark.conf.set("graft.graph.parts", "7")
      // the r12 per-iteration checkpoint truncates the result's lineage,
      // so assert the layout on the edge cache pageRankInt actually
      // builds (extracted as Graph.edgeCache for exactly this spec)
      val e = Graph.edgeCache(edges)
      assert(e.rdd.getNumPartitions == 7,
        s"expected 7-way edge cache, got ${e.rdd.getNumPartitions}")
      e.unpersist()
      val got = Graph.pageRankInt(edges, iters = 1)
      // and the ranks are unchanged by the layout
      assert(got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("c1" -> 1425000L, "c2" -> 575000L, "s1" -> 1425000L, "s2" -> 575000L))
    } finally {
      spark.conf.unset("graft.graph.parts")
      spark.catalog.clearCache()
    }
  }
}
