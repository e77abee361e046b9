package graft

import graft.streaming.StreamIngest
import graft.pipeline.CopyRead
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Streaming ingest: file-source CSV stream → parse → inference →
  * checkpointed parquet sink; restart resumes without reprocessing
  * (the reference's token-checkpoint semantics, `read.go:100-107`). */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val base = s"/root/repo/target/tmp/stream_${java.util.UUID.randomUUID().toString.take(8)}"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("flag", BooleanType)))

  private def writeInputFile(n: Int, tag: String): Unit = {
    val dir = Paths.get(s"$base/in")
    Files.createDirectories(dir)
    val content = (1 to n)
      .map(i => s"""$i,"$tag-$i",${if (i % 2 == 0) "true" else "false"}""")
      .mkString("\n")
    Files.writeString(dir.resolve(s"$tag.csv"), content)
  }

  test("checkpointed stream ingests, then resumes with only new data") {
    writeInputFile(100, "first")
    val cfg = CopyConfig()
    val q1 = StreamIngest.writeParquetStream(
      StreamIngest.readCsvStream(spark, s"$base/in", schema, cfg),
      s"$base/out", s"$base/ckpt")
    q1.awaitTermination(60000)
    val afterFirst = spark.read.parquet(s"$base/out").count()
    assert(afterFirst == 100)

    // restart with one more file: checkpoint must resume, not reprocess
    writeInputFile(50, "second")
    val q2 = StreamIngest.writeParquetStream(
      StreamIngest.readCsvStream(spark, s"$base/in", schema, cfg),
      s"$base/out", s"$base/ckpt")
    q2.awaitTermination(60000)
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 150)
    assert(out.where(col("flag") === true).count() == 75)
    assert(out.agg(sum("id")).head.getLong(0) == (1 to 100).sum + (1 to 50).sum)
  }

  test("windowed event counts with watermark produce bounded-state plan") {
    // batch-mode check of the same transformation (streaming plan tested
    // via the analyzer accepting watermark + window grouping)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val out = StreamIngest.windowedEventCounts(ev)
    assert(out.columns.toSeq ==
      Seq("window_start", "window_end", "event_type", "n_events", "sum_value"))
    assert(out.count() > 0)
    val sess = StreamIngest.sessionizedEvents(ev)
    assert(sess.count() > 0)
  }
}
