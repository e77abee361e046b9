package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for the simhash pair stage: candidate volume,
  * distinct pairs, final output, and the hottest (combo, key) buckets —
  * the numbers that decide whether residual q36 growth is join-shaped
  * (candidates) or output-shaped (true near-dup pairs).
  * Usage: graft.tools.SimhashDebug <sfDir> */
object SimhashDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup
    val c = 7
    val widths = { val base = 60 / c; val extra = 60 % c
      (0 until c).map(i => if (i < extra) base + 1 else base) }
    val offsets = widths.scanLeft(0)(_ + _)
    def chunk(i: Int) =
      shiftright(col("simhash"), offsets(i)).bitwiseAND((1L << widths(i)) - 1)
    val pairKeys = for (i <- 0 until c; j <- i + 1 until c)
      yield shiftleft(chunk(i), widths(j)).bitwiseOR(chunk(j))
    val sig = Dedup.simhash(spark, sfDir).cache()
    println(s"docs=${sig.count()}")
    val banded = sig.select(col("doc_id"),
      posexplode(array(pairKeys: _*)).as(Seq("combo", "key"))).cache()
    println(s"banded=${banded.count()}")
    val hot = banded.groupBy("combo", "key").count()
      .orderBy(col("count").desc).limit(5).collect()
    hot.foreach(r => println(s"hot bucket combo=${r.get(0)} key=${r.get(1)} n=${r.get(2)}"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.combo") === col("b.combo") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    println(s"candidates(raw)=${cand.count()}")
    println(s"candidates(distinct)=${cand.distinct().count()}")
    val out = Dedup.simhashPairs(spark, sfDir)
    println(s"output=${out.count()}")
    spark.stop()
  }
}
