package graft

import graft.pipeline.{CopyRead, CopyWrite}
import org.apache.spark.sql.SparkSession

/** CLI dispatch — the reference's verb surface (`main.go:11-50`,
  * SURVEY.md §2A #22) over the Spark engine:
  *
  *   graft.Cli write <table> <col,col,...> --in <csvPathOrDir> --out <parquetDir> [flags]
  *   graft.Cli read  <table> <col,col,...> --in <parquetPath> --out <csvDir> [flags]
  *
  * Flags mirror `flag.go` names (SURVEY.md §2C): --header, --null,
  * --bool-style, --time-format, --chunk-size, --max-batch-size,
  * --max-parse-errors, --max-insert-errors, --max-attempts, --backoff,
  * --num-processes, --offset. `--connect/--keyspace` have no meaning
  * without a cluster; the table argument resolves to parquet here and to
  * a catalog table in production (see Tables).
  */
object Cli {

  def parseFlags(args: Seq[String], cfg: CopyConfig = CopyConfig()): (CopyConfig, Map[String, String]) = {
    var c = cfg
    val other = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val (k, v) = (args(i), if (i + 1 < args.length) args(i + 1) else "")
      k match {
        case "--header" => c = c.copy(header = true); i += 1
        // engine extension (not in flag.go): double rule in the cascade
        case "--with-doubles" => c = c.copy(withDoubles = true); i += 1
        case "--null" => c = c.copy(nullValue = v); i += 2
        case "--bool-style" => c = c.copy(boolStyle = v); i += 2
        case "--time-format" => c = c.copy(timeFormat = v); i += 2
        case "--chunk-size" => c = c.copy(chunkSize = v.toInt); i += 2
        case "--max-batch-size" => c = c.copy(maxBatchSizeKb = v.toInt); i += 2
        case "--max-parse-errors" => c = c.copy(maxParseErrors = v.toInt); i += 2
        case "--max-insert-errors" => c = c.copy(maxInsertErrors = v.toInt); i += 2
        case "--max-attempts" => c = c.copy(maxAttempts = v.toInt); i += 2
        case "--backoff" => c = c.copy(backoffMs = v.toLong); i += 2
        case "--num-processes" => c = c.copy(numProcesses = v.toInt); i += 2
        case "--offset" => c = c.copy(offset = v.toLong); i += 2
        case "--page-size" => c = c.copy(pageSize = v.toInt); i += 2
        case "--prefetch" => c = c.copy(prefetch = v.toInt); i += 2
        case "--partition-key-size" => c = c.copy(partitionKeySize = v.toInt); i += 2
        case flag if flag.startsWith("--") => other(flag.drop(2)) = v; i += 2
        case _ => sys.error(s"unexpected argument: $k")
      }
    }
    (c, other.toMap)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.Cli <write|read> <table> <col,col,...> --in <path> --out <path> [flags]")
      sys.exit(2)
    }
    val verb = args(0)
    val table = args(1)
    val cols = args(2).split(",").toSeq
    Identifiers.requireIdentifier(table, "table")
    cols.foreach(Identifiers.requireIdentifier(_, "column"))
    val (cfg, other) = parseFlags(args.drop(3).toSeq)
    val in = other.getOrElse("in", sys.error("--in is required"))
    val out = other.getOrElse("out", sys.error("--out is required"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${math.max(cfg.numProcesses, 1)}]"))
      .appName(s"graft-$verb-$table")
      .config("spark.sql.shuffle.partitions", math.max(cfg.numProcesses, 1))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      verb match {
        case "write" =>
          // CSV → typed rows → sink. A jdbc: --out is the reference's
          // actual shape (CSV → Cassandra ≙ CSV → JDBC store: prepared
          // INSERT batches, retry, budgets); otherwise parquet files.
          if (out.startsWith("jdbc:")) {
            val schema = org.apache.spark.sql.types.StructType(cols.map(c =>
              org.apache.spark.sql.types.StructField(c,
                org.apache.spark.sql.types.StringType)))
            // tagged compat cells don't map to JDBC DDL; string columns do
            // (the server-side schema is the arbiter, like Cassandra) —
            // callers wanting typed columns pre-declare them via a typed
            // store table; the harness demo keeps the stringly contract
            val (typed, errs) = CopyWrite.read(spark, in, cols, cfg,
              schema = Some(schema))
            graft.sources.JdbcBackend.writeTable(typed, out, table, cfg)
            errs.check()
            System.err.println(s"[graft] wrote table $table via $out")
          } else {
            val (typed, errs) = CopyWrite.read(spark, in, cols, cfg)
            CopyWrite.sink(typed, out, cfg, errs)
            System.err.println(s"[graft] wrote ${spark.read.parquet(out).count()} rows to $out")
          }
        case "read" =>
          val src =
            if (in.startsWith("jdbc:"))
              graft.sources.JdbcBackend.readTable(spark, in, table)
                .toDF(cols: _*) // JDBC stores may case-fold identifiers
            else spark.read.parquet(in)
          CopyRead.run(spark, src, cols, cols.head, cfg, out)
          System.err.println(s"[graft] exported $out")
        case v => sys.error(s"unknown verb: $v (want write|read)")
      }
    } finally spark.stop()
  }
}
