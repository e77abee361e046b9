package graft.tools

/** Print one oracle SQL text to stdout (inner-loop aid for new queries).
  * Usage: DumpOracle <queryName> */
object DumpOracle {
  def main(args: Array[String]): Unit =
    println(graft.SparkEntry.oracleSql(args(0)))
}
