package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from the driver's sf0.1 testdata for
  * the cross-SF scale probe (BASELINE.md): union `copies` key-shifted
  * replicas of every fact table, preserving referential integrity and —
  * critically — the DATA PROPERTIES the similarity/dedup operators key
  * on, so per-query time ratios measure the operators, not an artifact
  * of cloning:
  *
  *  - every key column shifts by `copy * 10_000_000` (far above any
  *    source key), so joins fan out exactly 10× and never cross copies;
  *  - `documents.text` goes through a per-copy letter bijection
  *    (`translate` over a rotation of "abcdefghij", copy 0 = identity):
  *    WITHIN a copy shingle equality is untouched (same bijection on
  *    both sides), ACROSS copies shingles differ, so the planted
  *    near-dup pair density stays constant instead of every doc gaining
  *    9 exact clones (which would inflate pair counts ~45× and make a
  *    linear join look quadratic);
  *  - `embeddings.embedding` is cyclically rotated by `copy` positions —
  *    norms and within-copy cosines are exactly preserved, cross-copy
  *    cosines drop to background level, same reasoning;
  *  - dimension tables (region, nation) are copied verbatim: in a real
  *    10× scale-up the dims don't grow, and every copy's foreign keys
  *    still resolve.
  *
  * The output is a TIMING corpus only (the oracle gate runs at sf0.01);
  * it is written under target/ and never committed.
  *
  * Usage: graft.tools.ScaleUp [srcDir] [outDir] [copies]
  */
object ScaleUp {

  private val Stride = 10000000L
  // FULL lowercase alphabet: a partial rotation (first 10 letters only)
  // left words composed of k-z letters identical across copies, so
  // word-hash-based signatures (simhash) stayed correlated and every
  // cross-copy clone pair fell within the hamming threshold — the pair
  // OUTPUT grew quadratically with copies (measured 10× pairs for 3×
  // data) and made a complete, linear-shaped operator read superlinear.
  // Rotating all 26 letters decorrelates cross-copy words entirely while
  // keeping within-copy equality exact (it is still a bijection).
  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/root/repo/target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); keep it a long and write
      // it back as a long — Tables.events does the div-1000 conversion
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, keyCols: Seq[String], outParts: Int)(
        perCopy: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val unioned = (0 until copies).map { c =>
        val shifted = keyCols.foldLeft(base)(
          (df, k) => df.withColumn(k, col(k) + lit(c * Stride)))
        perCopy(shifted, c)
      }.reduce(_ unionAll _)
      unioned.repartition(outParts)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scaleup] $table x$copies -> $out/$table.parquet")
    }

    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    replicate("customer", Seq("c_custkey"), 8)()
    replicate("supplier", Seq("s_suppkey"), 4)()
    replicate("part", Seq("p_partkey"), 8)()
    replicate("orders", Seq("o_orderkey", "o_custkey"), 16)()
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"), 32)()
    replicate("events", Seq("event_id", "user_id"), 16)()
    replicate("documents", Seq("doc_id"), 8) { (df, c) =>
      val rot = Alpha.drop(c % Alpha.length) + Alpha.take(c % Alpha.length)
      df.withColumn("text", translate(col("text"), Alpha, rot))
    }
    replicate("embeddings", Seq("vec_id"), 4) { (df, c) =>
      if (c == 0) df
      else df.withColumn("embedding",
        concat(expr(s"slice(embedding, ${c + 1}, ${64 - c})"),
          expr(s"slice(embedding, 1, $c)")))
    }
    spark.stop()
  }
}
