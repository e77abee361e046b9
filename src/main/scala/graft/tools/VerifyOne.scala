package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query slice of [[graft.Verify]] for the inner iteration loop:
  * dump ONE SparkEntry query's result to parquet (same session config as
  * Verify) so `scripts/check.py`-style DuckDB compare can gate it without
  * re-running the whole suite. Usage: VerifyOne <sfDir> <outDir> <name>... */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
