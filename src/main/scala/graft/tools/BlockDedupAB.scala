package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 probe (r14 verdict item 5): quiet A/B of q170's two shapes at
  * decade SFs — both r14 attempts to price the in-row-splice rework
  * landed in external load-20 windows and were recorded as confounded.
  * THE A/B DECIDED A REVERT — on premise, not speed. Warmed quiet
  * interleaved min-of-reps put the two shapes in the SAME BAND with
  * the direction flipping across decades (sf10: in-row 4.43 vs struct
  * 5.91 s; sf30: struct 21.36 vs in-row 23.85 s). What the plan audit
  * settled is the rework's CLAIM: "block text never shuffles" is
  * false — its per-doc verdict table is corpus-cardinality, so the
  * join back SMJ-shuffles the text-bearing side anyway, plus an extra
  * exploded-hash SMJ exchange for the flag join (where the struct
  * shape gets a static broadcast). Tie on speed → the simpler plan
  * ships: `Dedup.blockDedup` is the struct-splice shape again; the
  * rework is preserved here as a probe-only replica so the A/B stays
  * re-runnable.
  *
  *  - `struct` arm = the SHIPPED `Dedup.blockDedup` (struct splice):
  *    broadcast-flagged (blk, btext) rows, collect_list of surviving
  *    structs per doc — text moves through exactly one
  *    map-side-combined agg exchange.
  *  - `inrow` arm = the r14 rework (replica of 92344c0, reverted at
  *    r15): int-only flag path, per-doc drop-lists, splice re-derived
  *    in-row on the join back.
  *
  * Usage: graft.tools.BlockDedupAB <sfDir> <repeat> [explain]
  */
object BlockDedupAB {
  private def inRowSpliceShape(s: SparkSession, d: String,
      blockWords: Int = 8): DataFrame = {
    val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
    val blockArr = when(size(col("w")) > 0,
      transform(sequence(lit(0), ((size(col("w")) - 1) / blockWords).cast("int")),
        i => array_join(slice(col("w"), i * blockWords + 1, lit(blockWords)), " ")))
      .otherwise(array().cast("array<string>"))
    val withBlocks = docs
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)).as("w"))
      .select(col("doc_id"), blockArr.as("blocks"))
    val hashes = withBlocks
      .select(col("doc_id"), posexplode(transform(col("blocks"), b =>
        conv(substring(md5(b), 1, 15), 16, 10).cast("long")))
        .as(Seq("blk", "bh")))
    val hot = hashes.groupBy(col("bh")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select(col("bh"), lit(true).as("hot"))
    val dropPer = hashes.join(hot, Seq("bh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("hot"), 1L).otherwise(0L)).as("n_dropped"),
        collect_list(when(col("hot"), col("blk"))).as("drop_blks"))
    withBlocks.join(dropPer, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        when(col("n_dropped").isNull || col("n_dropped") === 0L,
          array_join(col("blocks"), " "))
          .otherwise(expr(
            """array_join(filter(transform(sequence(0, size(blocks) - 1),
              |i -> CASE WHEN array_contains(drop_blks, i) THEN NULL
              |ELSE element_at(blocks, i + 1) END),
              |x -> x IS NOT NULL), ' ')""".stripMargin.replace("\n", " ")))
          .as("text_clean"))
      .orderBy(col("doc_id"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeat = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.Tables.aqeInitialPartitions(sfDir, 32).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val arms = Seq(
      "struct" -> (() => graft.ops.Dedup.blockDedup(spark, sfDir)),
      "inrow" -> (() => inRowSpliceShape(spark, sfDir)))
    if (args.length > 2 && args(2) == "explain") {
      arms.foreach { case (label, df) =>
        println(s"==== $label shape ====")
        println(df().queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      spark.stop(); return
    }
    // one untimed warm-up per arm (JIT + codegen + parquet footers —
    // the r15 first window's run-1 samples were 4-14x warmup noise)
    arms.foreach { case (_, df) =>
      df().write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    // interleaved so a load spike cannot poison one arm's every sample
    for (i <- 1 to repeat; (label, df) <- arms) {
      val t0 = System.nanoTime()
      df().write.format("noop").mode("overwrite").save()
      println(f"q170_$label%s run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"load=${java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage}%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
