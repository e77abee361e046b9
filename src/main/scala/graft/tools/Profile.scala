package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: time one or more SparkEntry queries repeatedly.
  * Usage: graft.tools.Profile <sfDir> <repeat> <queryName>... */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeat = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // sketch aggregates (TypedImperativeAggregate) carry ~256B buffers;
      // the 128-group sort-fallback default defeats them
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE start width sized to the input volume (the r11 Bench/Verify
      // rule — flat 256 taxed gate SFs ~1.5-2x on the LSH family while
      // decade dirs still need it; Tables.aqeInitialPartitions).
      // Overridable for A/B via SPARK_GRAFT_INIT_PARTS.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS",
          graft.Tables.aqeInitialPartitions(sfDir, 32).toString))
      // match the adopted Bench/Verify state store (r9 A/B) so streaming
      // probes measure the shipped configuration
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // r17: count Spark jobs per run — at gate SF most faces are
    // fixed-cost bound, so #jobs × per-job overhead is the cost model;
    // a face whose wall-clock is high relative to its job count is
    // planning/codegen-bound instead (guide §7.3).
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          nJobs.incrementAndGet()
      })
    for (name <- names; i <- 1 to repeat) {
      val j0 = nJobs.get()
      val t0 = System.nanoTime()
      // noop DSv2 sink: full evaluation of every output row, same forced
      // eval as Bench (`.count()` would prune the very projections being
      // profiled)
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name run $i: $dt%.2fs jobs=${nJobs.get() - j0}")
      spark.catalog.clearCache() // runs stay independent (SharedPlans re-persists)
    }
    spark.stop()
  }
}
