package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the q98 PageRank routes in ONE JVM, interleaved: the driver
  * array-sweep route (default threshold) vs the distributed star-shaped
  * message-passing loop (forced via graft.graph.driverMaxEdges=0). Full
  * pageRankGate evaluation through the noop sink each run, same session
  * confs as Bench. Usage: PrAB <sfDir> <runsPerConfig> */
object PrAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val runs = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.Tables.aqeInitialPartitions(sfDir, 32).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = scala.collection.mutable.Map[String, List[Double]]()
    for (i <- 1 to runs; mode <- Seq("driver", "distributed")) {
      if (mode == "distributed")
        spark.conf.set("graft.graph.driverMaxEdges", "0")
      else spark.conf.unset("graft.graph.driverMaxEdges")
      val t0 = System.nanoTime()
      graft.ops.Graph.pageRankGate(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pr-ab] $mode run $i: $dt%.2fs")
      results(mode) = dt :: results.getOrElse(mode, Nil)
      spark.catalog.clearCache()
    }
    results.foreach { case (m, ts) =>
      val warm = ts.dropRight(1) // drop run 1 (cold)
      if (warm.nonEmpty)
        println(f"[pr-ab] $m warm-min=${warm.min}%.2fs " +
          f"warm-med=${warm.sorted.apply(warm.size / 2)}%.2fs")
    }
    spark.stop()
  }
}
