package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r16 scratch probe: PQ recall raw vs rotated on a parameterized
  * anisotropic fixture — the measurement loop behind the q199 recall
  * spec. Usage: OpqFixtureProbe <n> <decay> [balanced 0|1] */
object OpqFixtureProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 256
    val decay = if (args.length > 1) args(1).toDouble else 0.82
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    import graft.functions.VectorExprs.vecDot
    val dim = 64
    def had(i: Int, j: Int): Int =
      if (Integer.bitCount(i & j) % 2 == 0) 1 else -1
    def z(v: Int, i: Int): Double = {
      var h = (v.toLong << 32 | i.toLong) + 0x9e3779b97f4a7c15L
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      val u = ((h ^ (h >>> 31)) & 0xfffff).toDouble / 0xfffff - 0.5
      u * math.pow(decay, i)
    }
    import spark.implicits._
    val fix = (0 until n).map { v =>
      val zs = Array.tabulate(dim)(i => z(v, i))
      val x = Array.tabulate(dim)(j =>
        (0 until dim).map(i => had(i, j) * zs(i)).sum.toFloat / 8.0f)
      (v.toLong, x.toSeq)
    }.toDF("vec_id", "embedding").cache()
    val qe = Similarity.quantizeInt8(fix).select(col("vec_id"), col("q8"))
    val probes = qe.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q8").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("cid").asc)
    val truth = qe.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        vecDot(col("qv"), col("q8")).cast("long").as("dot"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 10)
      .select(col("qid"), col("cid")).cache()
    def recall(pq: DataFrame): Long =
      1000000L * truth.join(pq.select(col("qid"), col("cid")), Seq("qid", "cid")).count() / truth.count()
    val base = recall(Similarity.pqTopK(fix))
    val rot = Similarity.rotationRowsFor(
      Similarity.gramCollectFrame(qe, dim)).toDF("comp", "dim", "r")
    val rotated = recall(Similarity.pqTopK(Similarity.rotateFrameBy(qe, rot)))
    println(s"n=$n decay=$decay recall_ppm raw=$base rotated=$rotated")
    spark.stop()
  }
}
