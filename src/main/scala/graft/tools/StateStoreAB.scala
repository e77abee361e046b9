package graft.tools

import org.apache.spark.sql.SparkSession

/** RocksDB vs HDFSBacked state-store A/B for the streaming gate faces
  * (r8 verdict item 5): ~22 s of the 141 s bench total is state-store
  * commit floor (q57 7.4, q103 6.9, q108 7.8, q111 2.0 at sf0.1 — the
  * r7 decomposition showed a stateless passthrough of the same stream
  * runs in 0.9 s). The provider is the one untried lever: RocksDB keeps
  * state off-heap in a native LSM and snapshots incrementally, so its
  * per-batch commit cost model is very different from HDFSBacked's
  * full-map file write — but it pays a native-library init + column-
  * family setup per store, which at local[32]'s 32 partitions × few
  * batches could swamp the saving. Measure, don't guess.
  *
  * Runs each face `reps`× under each provider (alternating, same
  * session, min reported — the probe convention) and prints a verdict
  * line per face plus totals.
  *
  * Usage: graft.tools.StateStoreAB <sfDir> [reps]
  */
object StateStoreAB {
  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.head
    val reps = if (args.length > 1) args(1).toInt else 3

    val faces: Seq[(String, () => Unit)] = Seq(
      "q57" -> (() => force(graft.ops.Pipelines.streamIntervalJoin(spark, d))),
      "q103" -> (() => force(graft.ops.Pipelines.cdcApplyStreamSummary(spark, d))),
      "q108" -> (() => force(graft.ops.Pipelines.streamOuterIntervalJoin(spark, d))),
      "q111" -> (() => force(graft.ops.Pipelines.streamHeavyHitters(spark, d))))

    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }

    val results = faces.map { case (name, f) =>
      val byProvider = Seq(Hdfs -> "hdfs", Rocks -> "rocks").map { case (cls, tag) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
        val ts = (1 to reps).map(_ => timed(f))
        tag -> (ts.min, ts)
      }.toMap
      val (hMin, hAll) = byProvider("hdfs")
      val (rMin, rAll) = byProvider("rocks")
      println(f"[ab] $name hdfs_min=$hMin%.2fs rocks_min=$rMin%.2fs " +
        f"delta=${hMin - rMin}%+.2fs hdfs=${hAll.map(t => f"$t%.2f").mkString(",")} " +
        f"rocks=${rAll.map(t => f"$t%.2f").mkString(",")}")
      (name, hMin, rMin)
    }
    val (th, tr) = (results.map(_._2).sum, results.map(_._3).sum)
    println(f"[ab] TOTAL hdfs=$th%.2fs rocks=$tr%.2fs delta=${th - tr}%+.2fs " +
      (if (tr < th) "-> ADOPT rocksdb" else "-> keep hdfs"))
    spark.stop()
  }

  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
