package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Decompose the q38 cost at two AQE initial widths: time the shared
  * LSH pair materialization and the connected-components loop
  * SEPARATELY (r11 — the q107/q38 bench regression A/B showed the whole
  * family ~2x slower at initialPartitionNum=256 vs 32 at sf0.1, and the
  * CC-scoped override alone did not close it; this names where the tax
  * lives). Usage: CcAB <sfDir> <runs> */
object CcAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val runs = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "256"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc-ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val pairs = Dedup.minhashLshPairsShared(spark, sfDir)
      .select(col("d1"), col("d2"))
    t("pairs materialize")(pairs.count())
    for (i <- 1 to runs)
      t(s"connectedComponents run $i")(
        Dedup.connectedComponents(pairs).count())
    spark.stop()
  }
}
