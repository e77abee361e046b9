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

  test("ranged splits over non-ASCII CSV lose no records (mid-UTF-8 split starts)") {
    // 2-byte Greek letters make most byte offsets fall inside a character;
    // pre-fix, the decoded-char byte arithmetic drifted on the replacement
    // chars produced by a mid-character seek and dropped boundary records.
    val n = 400
    val lines = (0 until n).map(i => f"$i%06d,αβγδε").mkString("\n") + "\n"
    Files.writeString(Paths.get(s"$base/utf8.csv"), lines)
    // line = 6+1+10 bytes payload + '\n' = 18 bytes; 97 is coprime → splits
    // land mid-line and mid-character
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    val df = spark.read.format("graft-quotecsv").schema(schema)
      .option("path", s"$base/utf8.csv").option("maxSplitBytes", 97).load()
    assert(df.rdd.getNumPartitions > 10)
    assert(df.count() == n)
    assert(df.agg(countDistinct(col("id"))).head.getLong(0) == n)
    assert(df.where(col("s") === "αβγδε").count() == n)
  }

  test("bool-style follows the reference order: trueValue first (write.go:117)") {
    val c = CopyConfig(boolStyle = "yes,no")
    assert(c.trueValue == "yes" && c.falseValue == "no")
    assert(TypeInference.inferCell(RawCell("yes", quoted = false), c) ==
      TypeInference.BoolValue(true))
    assert(TypeInference.inferCell(RawCell("no", quoted = false), c) ==
      TypeInference.BoolValue(false))
  }

  test("DSv2 write publishes atomically: zombie staging files never surface") {
    val out = s"$base/atomic"
    Files.createDirectories(Paths.get(s"$out/_temporary"))
    // a lingering file from a dead executor whose abort() never ran
    Files.writeString(Paths.get(s"$out/_temporary/part-99999-13.csv"), "999,zombie\n")
    val src = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(java.lang.Long.valueOf(1L), "a"),
        org.apache.spark.sql.Row(java.lang.Long.valueOf(2L), "b")),
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
      .repartition(2)
    src.write.format("graft-quotecsv").option("path", out)
      .mode("append").save() // append: pre-planted staging dir survives until commit
    assert(!Files.exists(Paths.get(s"$out/_temporary")), "staging dir must be gone after commit")
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val back = spark.read.format("graft-quotecsv").schema(schema)
      .option("path", out).load()
    assert(back.count() == 2)
    assert(back.where(col("v") === "zombie").count() == 0)
  }

  test("DSv2 read enforces the parse-error budget; default counts and drops") {
    Files.writeString(Paths.get(s"$base/bad.csv"),
      "1,ok\n2,\"unterminated\n3,ok\n4,bad\"quote\n5,ok\n")
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    def read(opts: Map[String, String]) = {
      // small maxSplitBytes forces ranged (line) mode, where each physical
      // line parses independently — the unterminated quote on line 2 and
      // the bare quote on line 4 are the 2 budgeted errors
      val r = spark.read.format("graft-quotecsv").schema(schema)
        .option("path", s"$base/bad.csv").option("maxSplitBytes", 20)
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load()
    }
    assert(read(Map.empty).count() == 3) // dropped, not silently wrong rows
    // budget is per split; 0 = any malformed record in any split fails the scan
    val e = intercept[org.apache.spark.SparkException] {
      read(Map("maxParseErrors" -> "0")).count()
    }
    assert(e.getMessage.contains("too many parse errors") ||
      Option(e.getCause).exists(_.getMessage.contains("too many parse errors")))
    assert(read(Map("maxParseErrors" -> "2")).count() == 3) // within budget: ok
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
