package graft.tools

import org.apache.spark.sql.SparkSession

/** q112 verification-leg probe at large SF (r9): the collect_set leg
  * exhausts local scratch at sf30 (measured: >73 GB of shuffle spill —
  * every candidate row ships BOTH docs' full shingle-set arrays), so
  * this times the RELATIONAL (PPJoin count-common) leg alone, which
  * ships narrow (candidate, shingle) rows instead of materialized sets.
  * Usage: graft.tools.Q112RelProbe <sfDir> <runs> [setLeg] */
object Q112RelProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val runs = args(1).toInt
    val useSet = args.length > 2 && args(2) == "setLeg"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      graft.ops.Dedup.prefixJaccardPairs(spark, d, setVerify = useSet, route = false)
        .write.format("noop").mode("overwrite").save()
      val leg = if (useSet) "set" else "rel"
      println(f"q112($leg) run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
