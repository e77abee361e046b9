package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 probe (r14 verdict item 5): quiet A/B of q170's two shapes at
  * decade SFs — both r14 attempts to price the in-row-splice rework
  * landed in external load-20 windows and were recorded as confounded.
  *
  *  - OLD (probe-only replica of the pre-92344c0 shape): block TEXT
  *    rides the per-doc shuffle — posexplode to (blk, btext) rows, flag
  *    join, then collect_list of (blk, btext) structs + array_sort per
  *    doc to rebuild the spliced text. The struct shuffle + sort was
  *    the suspected spill source at sf30.
  *  - NEW (the shipped `Dedup.blockDedup`): flag path carries only
  *    (doc_id, blk:int, bh:long); the splice re-derives blocks in-row
  *    from the doc's own text on the join back.
  *
  * Usage: graft.tools.BlockDedupAB <sfDir> <repeat>
  */
object BlockDedupAB {
  private def oldShape(s: SparkSession, d: String, blockWords: Int = 8): DataFrame = {
    val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
    val blockArr = when(size(col("w")) > 0,
      transform(sequence(lit(0), ((size(col("w")) - 1) / blockWords).cast("int")),
        i => array_join(slice(col("w"), i * blockWords + 1, lit(blockWords)), " ")))
      .otherwise(array().cast("array<string>"))
    val blocks = docs
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)).as("w"))
      .select(col("doc_id"), posexplode(blockArr).as(Seq("blk", "btext")))
      .withColumn("bh",
        conv(substring(md5(col("btext")), 1, 15), 16, 10).cast("long"))
    val hot = blocks.groupBy(col("bh")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select(col("bh"), lit(true).as("hot"))
    val flagged = blocks.join(hot, Seq("bh"), "left")
      .select(col("doc_id"), col("blk"), col("btext"),
        coalesce(col("hot"), lit(false)).as("hot"))
    val per = flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("hot"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(transform(array_sort(collect_list(
            when(!col("hot"), struct(col("blk"), col("btext"))))),
          b => b.getField("btext")), " ").as("text_clean"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
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
    // interleaved so a load spike cannot poison one arm's every sample
    for (i <- 1 to repeat; (label, df) <- Seq(
        "old" -> (() => oldShape(spark, sfDir)),
        "new" -> (() => graft.ops.Dedup.blockDedup(spark, sfDir)))) {
      val t0 = System.nanoTime()
      df().write.format("noop").mode("overwrite").save()
      println(f"q170_$label%s run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"load=${java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage}%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
