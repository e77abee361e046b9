package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sizing probe for the q209 containment prefix pre-filter (VERDICT r17
  * item 5, guide §1.1 measure-first): BEFORE building the operator,
  * quantify on the real spliced corpus (a) the brute plan's candidate
  * occurrence volume Σ C(df,2), (b) the prefix⋈full join's occurrence
  * volume under the size-order constraint, (c) the DISTINCT candidate
  * pair count the set-verify leg would have to ship sets for, and
  * (d) the true output pair count. (c) is the go/no-go number: q112's
  * set leg won at ~15k candidates; millions would make the verify join
  * the new bottleneck. Usage: Q209Probe <sfDir> */
object Q209Probe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = 0.9; val tSlack = t - 1e-4; val maxDf = 100
    val base = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val spliced = base.unionByName(
      base.where(col("doc_id") % 77 === 5)
        .select((-col("doc_id") - 2000000L).as("doc_id"),
          substring(col("text"), lit(1), (length(col("text")) / 2).cast("int"))
            .as("text")))
    val shAll = graft.ops.Dedup.shingles(spliced)
    val dfreq = shAll.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val sh = shAll.join(dfreq, "shingle").cache()
    val st = dfreq.agg(sum(col("df")), sum(expr("df * (df - 1) div 2")),
      max(col("df")), count(lit(1))).head
    println(s"[q209probe] postings=${st.getLong(0)} brute_cand_occ=${st.getLong(1)} " +
      s"maxdf=${st.getLong(2)} shingles=${st.getLong(3)}")
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("shingle").asc)
    val whole = Window.partitionBy(col("doc_id"))
    val ranked = sh.withColumn("rn", row_number().over(byRarity))
      .withColumn("ns", count(lit(1)).over(whole))
    val prefix = ranked
      .where(col("rn") <= col("ns") - ceil(col("ns") * tSlack) + 1)
      .select(col("doc_id"), col("shingle"), col("ns")).cache()
    println(s"[q209probe] prefix_rows=${prefix.count()} " +
      s"full_rows=${sh.count()}")
    val full = ranked.select(col("doc_id"), col("shingle"), col("ns"))
    val candOcc = prefix.as("a").join(full.as("b"),
      col("a.shingle") === col("b.shingle")
        && col("a.doc_id") =!= col("b.doc_id")
        && col("a.ns") <= col("b.ns"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    val nOcc = candOcc.count()
    val pairs = candOcc.select(least(col("da"), col("db")).as("d1"),
      greatest(col("da"), col("db")).as("d2")).distinct()
    val nPairs = pairs.count()
    println(s"[q209probe] prefix_cand_occ=$nOcc distinct_cand_pairs=$nPairs")
    val out = graft.ops.Dedup.containmentPairs(spark, d)
    println(s"[q209probe] true_output_pairs=${out.count()}")
    spark.stop()
  }
}
