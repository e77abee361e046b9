package graft.tools

import org.apache.spark.sql.SparkSession

/** r16: config A/B over the expensive streaming faces — RocksDB
  * changelog checkpointing (incremental commit instead of full snapshot
  * per batch) and stream partition width 8 vs 4 — measuring whether the
  * per-batch state-store commit is a real term of the 3-4 s/face floor.
  * Receipts are oracle-gated, so any config that changes results fails
  * the gate; this probe only prices the legal knobs.
  *
  * Usage: StreamConfAB <sfDir> [reps]
  */
object StreamConfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val faces = Seq("q57_stream_interval_join", "q103_cdc_apply_stream",
      "q149_stream_admission", "q161_stream_index", "q175_stream_erasure",
      "q192_stream_budget")

    def run(label: String, confs: Map[String, String]): Unit = {
      val b = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.ui.enabled", "false")
      confs.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // warm-up: one pass untimed
      faces.foreach { f =>
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
      println(f"$label total=${t.map(_._2).sum}%6.2f  " +
        t.map { case (f, v) => f"${f.takeWhile(_ != '_')}=$v%.2f" }.mkString(" "))
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    run("base(parts=8)        ", Map("graft.stream.parts" -> "8"))
    run("changelog(parts=8)   ", Map("graft.stream.parts" -> "8",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true"))
    run("parts=4              ", Map("graft.stream.parts" -> "4"))
    run("parts=4+changelog    ", Map("graft.stream.parts" -> "4",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true"))
  }
}
