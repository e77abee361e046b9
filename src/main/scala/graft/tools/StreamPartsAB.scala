package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the streaming faces across state-partition counts (r9): each
  * micro-batch pays a per-partition state-store commit, and the suite's
  * streaming state is tiny (bounded sketches, one long per key, live
  * keys), so 32 partitions' commit floor may dominate wall clock.
  * `spark.sql.shuffle.partitions` is a runtime SQL conf and each face
  * builds a fresh checkpoint, so the count binds cleanly per run.
  * Usage: graft.tools.StreamPartsAB <sfDir> <runsPerCell> <query>... */
object StreamPartsAB {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val runs = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the faces now read graft.stream.parts (default 8) inside
    // runStream; drive that knob, not the session batch width
    for (parts <- Seq(32, 16, 8, 4); name <- names; i <- 1 to runs) {
      spark.conf.set("graft.stream.parts", parts)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"$name parts=$parts run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
