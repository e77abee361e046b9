package graft.tools

import org.apache.spark.sql.SparkSession

/** r15 probe (r14 verdict item 4): time q184's DEFAULT (self-sized
  * √n-stride) path at decade SFs. The gate face pins stride 100 for
  * oracle parity and measured superlinear at sf10 (cells ∝ n/100 there,
  * so the broadcast-argmax per-row cost grows with n); the shipped
  * default self-sizes cells ≈ √n — this probe puts a decade row on the
  * DEFAULT path so the superlinearity question is settled against the
  * code users actually run, not the pinned gate fixture.
  *
  * Run 1 at each SF pays the one-time corrupted-index fixture build
  * (fingerprint-keyed) and is reported separately.
  *
  * Usage: graft.tools.DigestDefaultProbe <sfDir> <repeat>
  */
object DigestDefaultProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeat = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.Tables.aqeInitialPartitions(sfDir, 32).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to repeat) {
      val t0 = System.nanoTime()
      graft.ops.Similarity.ivfDigestAudit(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"q184_default run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
