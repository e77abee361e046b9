package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q112 vs q32 A/B across df-cap regimes (r8 verdict item 1): at the
  * default cap (maxDf=100) the capped brute force is already linear and
  * the prefix filter was measured SLOWER at sf1/sf10 — so where is the
  * crossover where SSJoin-style prefix pruning actually wins, and does
  * the relational (PPJoin) verification beat the collect_set one?
  *
  * For each (sfDir, maxDf) this times three plans producing the SAME
  * rows (asserted):
  *   brute    — [[graft.ops.Dedup.jaccardPairsPlan]]: full capped
  *              self-join, Σ C(df,2) pair rows before the group-by;
  *   pfx-rel  — prefixJaccardPairs, relational verification;
  *   pfx-set  — prefixJaccardPairs, collect_set verification;
  * and prints the theoretical pair volumes (Σ C(df,2) over the full vs
  * prefix-only postings) that explain the wall clocks.
  *
  * MEASURED FINDING (this testdata family, probe_q112_ab_r9.txt): the
  * shingle df distribution is BOUNDED — max df = 25 at sf0.1 AND sf1
  * (ScaleUp perturbs text into fresh shingle universes), so the default
  * cap never bites, Σ C(df,2) is already linear, and the prefix filter
  * is pure window-sort overhead: brute wins at every probed (SF, cap).
  * The regime the SSJoin literature targets — heavy-tailed df where the
  * self-join is quadratic in hot shingles — has to be CONSTRUCTED here:
  * `boilerplate <frac> <words>` appends one shared boilerplate sentence
  * to a doc fraction, giving ~frac·n docs a run of hot shingles. In that
  * regime the capped brute force must either drop the hot shingles
  * (cap bites -> misses boilerplate-driven pairs) or explode; the prefix
  * join keeps hot shingles OUT of prefixes (rarest-first) while still
  * verifying them exactly.
  *
  * Usage: graft.tools.PrefixJaccardAB <sfDir> [maxDf ...] [boilerplate <frac> <words>]
  * (default caps: 100 400 1000 4000)
  */
object PrefixJaccardAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.head
    val bpIdx = args.indexOf("boilerplate")
    val (capArgs, bp) =
      if (bpIdx >= 0) (args.slice(1, bpIdx), Some((args(bpIdx + 1).toDouble, args(bpIdx + 2).toInt)))
      else (args.tail, None)
    val caps = if (capArgs.nonEmpty) capArgs.map(_.toInt).toSeq
               else Seq(100, 400, 1000, 4000)

    // corpus under test: the table itself, or the table with a shared
    // boilerplate sentence appended to ~frac of docs (hot-shingle regime)
    def corpus(): org.apache.spark.sql.DataFrame = {
      val docs = graft.Tables.documents(spark, d)
      bp match {
        case None => docs
        case Some((frac, nw)) =>
          val sentence = (1 to nw).map(i => s"boilerplate$i").mkString(" ")
          docs.withColumn("text",
            when(pmod(col("doc_id"), lit(1000)) < lit((frac * 1000).toInt),
              concat(col("text"), lit(" " + sentence))).otherwise(col("text")))
      }
    }

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // count() forces the whole plan; result width is 4 narrow columns so
    // the count job ≈ the noop-write job without sink noise
    def run(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      spark.catalog.clearCache() // each plan .cache()s its postings
      timed(df.count())
    }

    caps.foreach { cap =>
      // pair volumes that explain the walls: Σ C(df,2) over full vs
      // prefix postings (the join's pre-aggregation row count)
      val sh = graft.ops.Dedup.shingles(corpus())
      val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .where(col("df") <= cap)
      val fullPairs = dfreq.agg(sum(col("df") * (col("df") - 1) / 2))
        .collect().head.getDouble(0).toLong
      val (tb, nb) = run(graft.ops.Dedup.jaccardPairsOf(corpus(), cap))
      val (tr, nr) = run(graft.ops.Dedup.prefixJaccardPairsOf(corpus(), cap, 0.5, setVerify = false, route = false))
      val (ts, nsn) = run(graft.ops.Dedup.prefixJaccardPairsOf(corpus(), cap, 0.5, setVerify = true, route = false))
      assert(nb == nr && nb == nsn,
        s"A/B result divergence at cap=$cap: brute=$nb rel=$nr set=$nsn")
      println(f"[ab] $d${bp.map{case (f,w)=>s" bp=$f/$w"}.getOrElse("")} cap=$cap " +
        f"full_join_pairs=$fullPairs pairs=$nb " +
        f"brute=$tb%.2fs pfx_rel=$tr%.2fs pfx_set=$ts%.2fs")
    }
    spark.stop()
  }
}
