package graft

import graft.csv.RawCell
import graft.infer.{GoTimeFormat, TypeInference}
import graft.pipeline.{CopyRead, CopyWrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Regression pins for the round-1 code-review findings — each test
  * fails on the pre-fix behavior. */
class ReviewRegressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val base = s"/root/repo/target/tmp/rr_${java.util.UUID.randomUUID().toString.take(8)}"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-regression-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(base))
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("split boundary: record starting exactly at maxSplitBytes is read exactly once") {
    // 11-byte lines; split size a multiple → every boundary is a record start
    val n = 100
    val lines = (0 until n).map(i => f"$i%010d").mkString("\n") + "\n"
    Files.writeString(Paths.get(s"$base/aligned.csv"), lines)
    val schema = StructType(Seq(StructField("id", LongType)))
    val df = spark.read.format("graft-quotecsv").schema(schema)
      .option("path", s"$base/aligned.csv").option("maxSplitBytes", 110).load()
    assert(df.rdd.getNumPartitions == 10)
    assert(df.count() == n)
    assert(df.agg(countDistinct(col("id"))).head.getLong(0) == n)
  }

  test("CopyRead default offset is a true no-op (NULL keys survive)") {
    val src = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(java.lang.Long.valueOf(1L), "a"),
        org.apache.spark.sql.Row(null, "b")),
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
    val out = s"$base/nullkey"
    CopyRead.run(spark, src, Seq("k", "v"), "k", CopyConfig(), out)
    val back = spark.read.text(out)
    assert(back.count() == 2) // NULL-key row exported, rendered as NULL literal
    assert(back.where(col("value") === "NULL,\"b\"").count() == 1)
  }

  test("DSv2: IsNotNull is enforced (residual filters re-applied by Spark)") {
    Files.writeString(Paths.get(s"$base/nn.csv"), "1,x\nNULL,y\n2,NULL\n")
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    val df = spark.read.format("graft-quotecsv").schema(schema)
      .option("path", s"$base/nn.csv").load()
    assert(df.where(col("id").isNotNull).count() == 2)
    assert(df.where(col("s").isNotNull).count() == 2)
  }

  test("DSv2 declared StringType keeps verbatim text for numeric/bool/null-ish cells") {
    Files.writeString(Paths.get(s"$base/verbatim.csv"), "123,true,3.14\n")
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType),
      StructField("c", StringType)))
    val row = spark.read.format("graft-quotecsv").schema(schema)
      .option("path", s"$base/verbatim.csv").load().head()
    assert(row.toSeq == Seq("123", "true", "3.14")) // arbiter schema, like inferSchemad
  }

  test("zone-less time layout parses in the pure cascade (parity with Catalyst path)") {
    val cfg = CopyConfig(timeFormat = "2006-01-02 15:04:05")
    val r = TypeInference.inferCell(RawCell("2024-01-02 03:04:05", quoted = false), cfg)
    assert(r == TypeInference.TimestampValue(1704164645000000L)) // UTC semantics
  }

  test("Go layout Z0700 accepts a literal Z suffix (UTC), like Go") {
    val cfg = CopyConfig(timeFormat = "2006-01-02T15:04:05Z0700")
    val r = TypeInference.inferCell(RawCell("2024-01-02T03:04:05Z", quoted = false), cfg)
    assert(r == TypeInference.TimestampValue(1704164645000000L))
    assert(GoTimeFormat.toJavaPattern("2006-01-02T15:04:05Z0700") == "yyyy-MM-dd'T'HH:mm:ssXX")
  }

  test("ragged records: missing trailing cells render as NULL literal, no column shift") {
    val s = spark
    import s.implicits._
    val (parsed, _) = CopyWrite.parseRecords(Seq("1,only-two").toDS(), CopyConfig())
    val tagged = CopyWrite.inferTagged(parsed, Seq("a", "b", "c", "d"), CopyConfig())
    assert(tagged.select(col("c.tag"), col("d.tag")).head.toSeq == Seq("null", "null"))
    val line = CopyRead.toCsvLines(tagged, CopyConfig()).head()
    assert(line == "1,\"only-two\",NULL,NULL") // 4 cells, aligned
  }

  test("per-file headers: reading back our own multi-part header'd export is clean") {
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_orderpriority")).repartition(4)
    val out = s"$base/hdr"
    src.write.format("graft-quotecsv")
      .option("path", out).option("header", true).mode("overwrite").save()
    // 4 part files → 4 header lines on disk
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderpriority", StringType)))
    val (typed, errs) = CopyWrite.read(spark, out, schema.fieldNames.toSeq,
      CopyConfig(header = true), Some(schema))
    assert(typed.count() == src.count()) // no header rows leaked into data
    assert(typed.where(col("o_orderkey").isNull).count() == 0)
    errs.check()
  }
}
