package graft.tools

import org.apache.spark.sql.SparkSession

/** One-JVM interleaved A/B of a session-conf-gated code path (the PrAB
  * pattern generalized — VERDICT r17 item 2 asked for exactly this for
  * the foreachBatch receipt merges, and r18 uses it for every
  * conf-gated optimization candidate). Mode A = conf unset (shipped
  * default), mode B = conf set to the given value; run order alternates
  * AB/BA each round so linear box drift cancels. Full face evaluation
  * through the noop sink, same session confs as Bench (incl.
  * graft.stream.parts and the RocksDB state store).
  *
  * Usage: ConfAB <sfDir> <rounds> <confKey=value> <query>... */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val rounds = args(1).toInt
    val Array(confKey, confVal) = args(2).split("=", 2)
    val names = args.drop(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("graft.stream.parts", graft.ops.Pipelines.StreamParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.Tables.aqeInitialPartitions(sfDir, 32).toString)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          nJobs.incrementAndGet()
      })
    val results =
      scala.collection.mutable.Map[(String, String), List[(Double, Int)]]()
    def runOne(name: String, mode: String, round: Int): Unit = {
      if (mode == "B") spark.conf.set(confKey, confVal)
      else spark.conf.unset(confKey)
      val j0 = nJobs.get(); val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9; val jn = nJobs.get() - j0
      println(f"[conf-ab] $name $mode round $round: $dt%.2fs jobs=$jn")
      results((name, mode)) = (dt, jn) :: results.getOrElse((name, mode), Nil)
      spark.catalog.clearCache()
    }
    for (name <- names; r <- 1 to rounds) {
      val order = if (r % 2 == 1) Seq("A", "B") else Seq("B", "A")
      order.foreach(m => runOne(name, m, r))
    }
    for (name <- names; m <- Seq("A", "B")) {
      val ts = results.getOrElse((name, m), Nil)
      val warm = ts.dropRight(1) // drop the face's first round (cold JIT)
      if (warm.nonEmpty) {
        val ws = warm.map(_._1).sorted
        println(f"[conf-ab] $name $m warm-min=${ws.min}%.2fs " +
          f"warm-med=${ws(ws.size / 2)}%.2fs jobs=${warm.head._2}")
      }
    }
    spark.stop()
  }
}
