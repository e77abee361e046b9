package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** DSv2 quote-preserving CSV source: declared-schema inference, quote
  * dominance, column pruning and range-filter pushdown visible in the
  * plan and effective in results. */
class QuoteCsvSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = s"/root/repo/target/tmp/dsv2_${java.util.UUID.randomUUID().toString.take(8)}"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-dsv2-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/a.csv"),
      """1,"Ada",true,2024-01-02 03:04:05+0000
        |2,"Bob",false,NULL
        |3,"3",17,note""".stripMargin)
    Files.writeString(Paths.get(s"$dir/b.csv"),
      """4,unquoted,true,x
        |5,"q,with comma",false,"multi
        |line"""".stripMargin)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("flag", BooleanType), StructField("note", StringType)))

  private def load() =
    spark.read.format("graft-quotecsv").schema(schema).option("path", dir).load()

  test("declared-schema read: inference + quote dominance + multiline quotes") {
    val rows = load().orderBy("id").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[String]("name")).toSeq ==
      Seq("Ada", "Bob", "3", "unquoted", "q,with comma"))
    // row 3: flag column holds 17 → long doesn't match boolean → null
    assert(rows(2).isNullAt(2))
    // row 2: NULL literal → null note
    assert(rows(1).isNullAt(3))
    // row 5: embedded newline survives
    assert(rows(4).getAs[String]("note") == "multi\nline")
  }

  test("range filter is pushed into the scan and applied") {
    val df = load().where(col("id") > 3L).select("id", "name")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("graft-quotecsv"), plan)
    assert(plan.contains("pushed=[") && plan.contains("GreaterThan(id,3"), plan)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L))
  }

  test("column pruning reaches the reader") {
    val df = load().select("name")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("read=[name]"), plan)
    assert(df.count() == 5)
  }

  test("raw mode (no schema): tagged cells with quoted bits") {
    val raw = spark.read.format("graft-quotecsv").option("path", dir).load()
    val first = raw.select(explode(col("cells")).as("c"))
      .select(col("c.value"), col("c.quoted")).collect()
    assert(first.exists(r => r.getString(0) == "Ada" && r.getBoolean(1)))
    assert(first.exists(r => r.getString(0) == "1" && !r.getBoolean(1)))
  }

  test("one partition per file (small files / multiline)") {
    assert(load().rdd.getNumPartitions == 2)
  }

  test("DSv2 write → read round-trip through the connector commit protocol") {
    import org.apache.spark.sql.functions._
    val out = s"$dir-w"
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"),
        col("l_returnflag").as("flag"),
        col("l_quantity"),
        col("l_shipdate").cast("timestamp").as("ship"))
    src.write.format("graft-quotecsv")
      .option("path", out).mode("overwrite").save()
    assert(Files.exists(Paths.get(s"$out/_SUCCESS")))
    val wSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("l_orderkey", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("flag", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("l_quantity", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ship", org.apache.spark.sql.types.TimestampType)))
    val back = spark.read.format("graft-quotecsv").schema(wSchema)
      .option("path", out).load()
    assert(back.count() == src.count())
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(xxhash64(df.columns.map(col).toIndexedSeq: _*)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head.getDecimal(0)
    assert(sig(src).compareTo(sig(back)) == 0) // value-exact round-trip
  }

  test("byte-range splits: one big file parallelizes, no row lost or duplicated") {
    val big = s"$dir-big"
    Files.createDirectories(Paths.get(big))
    val n = 20000
    val body = (1 to n).map(i => s"""$i,"name-$i",${i % 2 == 0},note $i""").mkString("\n")
    Files.writeString(Paths.get(s"$big/data.csv"), "id,name,flag,note\n" + body)
    val df = spark.read.format("graft-quotecsv").schema(schema)
      .option("path", big).option("header", true)
      .option("maxSplitBytes", 64 * 1024) // force many splits
      .load()
    assert(df.rdd.getNumPartitions > 4, s"got ${df.rdd.getNumPartitions}")
    assert(df.count() == n)
    // exactly-once across split boundaries: ids sum and distinct count
    import org.apache.spark.sql.functions._
    val agg = df.agg(sum(col("id")), countDistinct(col("id"))).head()
    assert(agg.getLong(0) == n.toLong * (n + 1) / 2)
    assert(agg.getLong(1) == n)
    // pushed range filter still works on ranged splits
    assert(df.where(col("id") > (n - 100L)).count() == 100)
  }
}
