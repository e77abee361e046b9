package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.time.format.DateTimeFormatter

import graft.CopyConfig
import graft.infer.GoTimeFormat
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DataSource V2 write side of graft-quotecsv: the `read` verb's CSV
  * export (typed quoting — quote iff string, `read.go:183-185`) through
  * the standard connector commit protocol. Tasks stage to
  * `_temporary/part-<partition>-<task>.csv`; the driver's commit() renames
  * ONLY the files named in WriterCommitMessages into the final directory
  * and deletes the staging dir — so a killed executor (whose abort() never
  * runs) or a zombie speculative task leaves at most an orphan under
  * `_temporary`, never a visible partial/duplicate part file (the
  * commit-protocol fix for the reference's §3.4 bugs).
  */
final class QuoteCsvWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new QuoteCsvBatchWrite(
      info.options.get("path"), info.schema(),
      QuoteCsvSource.cfgFromOptions(info.options), doTruncate)
  }
}

final class QuoteCsvBatchWrite(path: String, schema: StructType,
    cfg: CopyConfig, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    require(path != null, "graft-quotecsv write: option 'path' is required")
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (truncate && fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(new Path(p, "_temporary"))
    new QuoteCsvWriterFactory(path, schema, cfg)
  }

  /** Publish exactly the task outputs Spark acknowledged: rename each
    * committed staging file to its final name, then drop the staging dir
    * (taking any zombie-task orphans with it) and mark _SUCCESS last. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    messages.foreach { case QuoteCsvCommit(staged, finalName, _) =>
      val from = new Path(staged)
      val to = new Path(dir, finalName)
      if (!fs.rename(from, to))
        sys.error(s"graft-quotecsv write: failed to publish $staged -> $to")
    }
    fs.delete(new Path(dir, "_temporary"), true)
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    fs.delete(new Path(dir, "_temporary"), true)
  }
}

final case class QuoteCsvCommit(stagedFile: String, finalName: String, rows: Long)
    extends WriterCommitMessage

final class QuoteCsvWriterFactory(path: String, schema: StructType, cfg: CopyConfig)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new QuoteCsvDataWriter(path, partitionId, taskId, schema, cfg)
}

final class QuoteCsvDataWriter(dir: String, partitionId: Int, taskId: Long,
    schema: StructType, cfg: CopyConfig) extends DataWriter[InternalRow] {

  // stage under _temporary; the task-unique name disambiguates speculative
  // attempts, and the commit message tells the driver the final name
  private val finalName = f"part-$partitionId%05d.csv"
  private val file = new Path(new Path(dir, "_temporary"), f"part-$partitionId%05d-$taskId.csv")
  private val fs = file.getFileSystem(new Configuration())
  private val out = new BufferedWriter(
    new OutputStreamWriter(fs.create(file, true), StandardCharsets.UTF_8), 64 * 1024)
  private val fmt: DateTimeFormatter = java.time.format.DateTimeFormatter
    .ofPattern(GoTimeFormat.toJavaPattern(cfg.timeFormat))
    .withZone(java.time.ZoneOffset.UTC)
  private var rows = 0L

  if (cfg.header) {
    out.write(schema.fieldNames.map(n => "\"" + n.replace("\"", "\"\"") + "\"")
      .mkString(","))
    out.write("\n")
  }

  private def renderCell(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) cfg.nullValue
    else dt match {
      case StringType =>
        "\"" + row.getUTF8String(i).toString.replace("\"", "\"\"") + "\""
      case BooleanType => if (row.getBoolean(i)) cfg.trueValue else cfg.falseValue
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case TimestampType =>
        val micros = row.getLong(i)
        fmt.format(Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
      case other => sys.error(s"graft-quotecsv write: unsupported type $other")
    }

  override def write(row: InternalRow): Unit = {
    val n = schema.length
    var i = 0
    while (i < n) {
      if (i > 0) out.write(",".charAt(0))
      out.write(renderCell(row, i, schema.fields(i).dataType))
      i += 1
    }
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    QuoteCsvCommit(file.toString, finalName, rows)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}
