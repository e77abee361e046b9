package graft.tools

import org.apache.spark.sql.SparkSession

/** One-config-per-JVM leg of the r16 streaming A/B (StreamConfAB's
  * in-JVM sequencing confounded configs with JIT warm-up order).
  * Usage: StreamConfOne <sfDir> <parts> <changelog 0|1> [reps] */
object StreamConfOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args(1)
    val changelog = args(2) == "1"
    val reps = if (args.length > 3) args(3).toInt else 2
    val faces = Seq("q57_stream_interval_join", "q103_cdc_apply_stream",
      "q149_stream_admission", "q161_stream_index", "q175_stream_erasure",
      "q192_stream_budget")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("graft.stream.parts", parts)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
      .config("spark.ui.enabled", "false")
    if (changelog)
      b.config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    faces.foreach { f => // untimed JIT/codegen warm-up
      try graft.SparkEntry.queries(f)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"$f: ${e.getMessage}") }
    }
    val t = faces.map { f =>
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(f)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      f -> samples.min
    }
    println(f"parts=$parts changelog=$changelog total=${t.map(_._2).sum}%6.2f  " +
      t.map { case (f, v) => f"${f.takeWhile(_ != '_')}=$v%.2f" }.mkString(" "))
    spark.stop()
  }
}
