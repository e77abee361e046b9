package graft.tools

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: a bare session (no graft-side configs)
  * running SparkEntry.entry — proves the flagship query doesn't depend on
  * any session setting we normally inject (UTC, shuffle partitions, AQE). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    require(n > 0, "smoke failed: entry returned no rows")
    spark.stop()
  }
}
