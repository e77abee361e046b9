package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer

import graft.CopyConfig
import graft.csv.{CsvParseException, QuoteCsv}
import graft.infer.TypeInference
import graft.infer.TypeInference._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 quote-preserving CSV source — the production seam for the
  * reference's `write` ingest (SURVEY.md §2A #1, §4 "candidate custom
  * pieces"): `spark.read.format("graft-quotecsv").schema(s).load(path)`.
  *
  * What makes it more than `spark.read.csv`:
  *  - the RFC-4180 quoted bit participates in typing (quote dominance,
  *    rule 1 of the cascade) — Spark's CSV reader discards it;
  *  - per-cell 7-rule inference against the DECLARED schema
  *    ([[TypeInference]]), with the reference's literals configurable via
  *    options (`nullValue`, `boolStyle`, `timeFormat`, `header`);
  *  - column pruning pushed into the scan: only requested columns are
  *    inferred/converted (SupportsPushDownRequiredColumns);
  *  - range predicates on long columns evaluated during the scan
  *    (SupportsPushDownFilters) — the `--offset` token-bound analog
  *    (SURVEY.md §2A #21) skips rows before they materialize.
  *
  * Partitioning: one input partition per file (the reference reads one
  * stdin stream; files are this source's token ranges). Records with
  * quoted embedded newlines are handled by whole-file record splitting.
  */
class QuoteCsvSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-quotecsv"

  /** Without a user schema: a single raw-cells column (exact-compat). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QuoteCsvSource.rawSchema

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QuoteCsvTable(schema, new CaseInsensitiveStringMap(properties))
}

object QuoteCsvSource {
  val rawSchema: StructType = StructType(Seq(
    StructField("cells", ArrayType(StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("quoted", BooleanType, nullable = false)))))))

  def cfgFromOptions(o: CaseInsensitiveStringMap): CopyConfig = CopyConfig(
    nullValue = o.getOrDefault("nullValue", "NULL"),
    boolStyle = o.getOrDefault("boolStyle", "false,true"),
    timeFormat = o.getOrDefault("timeFormat", "2006-01-02 15:04:05-0700"),
    header = o.getBoolean("header", false))
}

final class QuoteCsvTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-quotecsv(${options.get("path")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new QuoteCsvScanBuilder(schema, o)
}

final class QuoteCsvScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept range bounds on LongType fields and IsNotNull — evaluated
    * per-record inside the scan; everything else stays in Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def longField(name: String): Boolean =
      fullSchema.fields.exists(f => f.name == name && f.dataType == LongType)
    val (accepted, rejected) = filters.partition {
      case GreaterThan(a, _: java.lang.Long) => longField(a)
      case GreaterThanOrEqual(a, _: java.lang.Long) => longField(a)
      case IsNotNull(_) => true
      case _ => false
    }
    pushed = accepted
    rejected ++ accepted.filterNot(_.isInstanceOf[IsNotNull]) // IsNotNull fully handled
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new QuoteCsvScan(fullSchema, required, pushed, options)
}

final class QuoteCsvScan(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], options: CaseInsensitiveStringMap) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-quotecsv pushed=[${pushed.mkString(",")}] read=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val path = Option(options.get("path")).getOrElse(
      sys.error("graft-quotecsv: option 'path' is required"))
    val hconf = new org.apache.hadoop.conf.Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toIndexedSeq.filter(_.isFile).map(_.getPath.toString)
          .filterNot(f => f.endsWith("_SUCCESS") || f.contains("/."))
      else Seq(path)
    files.sorted.map(f => QuoteCsvInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new QuoteCsvReaderFactory(fullSchema, required, pushed,
      QuoteCsvSource.cfgFromOptions(options))
}

final case class QuoteCsvInputPartition(file: String) extends InputPartition

final class QuoteCsvReaderFactory(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], cfg: CopyConfig) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new QuoteCsvPartitionReader(
      partition.asInstanceOf[QuoteCsvInputPartition].file, fullSchema, required, pushed, cfg)
}

final class QuoteCsvPartitionReader(file: String, fullSchema: StructType,
    required: StructType, pushed: Array[Filter], cfg: CopyConfig)
    extends PartitionReader[InternalRow] {

  private val fmt = TypeInference.formatter(cfg.timeFormat)
  private val isRaw = fullSchema == QuoteCsvSource.rawSchema
  // index into the parsed record for every required output field
  private val fieldIdx: Array[Int] =
    required.fields.map(f => fullSchema.fieldIndex(f.name))
  // (full-schema index, bound, inclusive) for pushed range filters
  private val bounds: Array[(Int, Long, Boolean)] = pushed.collect {
    case GreaterThan(a, v: java.lang.Long) => (fullSchema.fieldIndex(a), v.longValue, false)
    case GreaterThanOrEqual(a, v: java.lang.Long) => (fullSchema.fieldIndex(a), v.longValue, true)
  }

  private val records: Iterator[String] = {
    val hconf = new org.apache.hadoop.conf.Configuration()
    val p = new Path(file)
    val in = p.getFileSystem(hconf).open(p)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
      out.toString("UTF-8")
    } finally in.close()
    val all = QuoteCsv.splitRecords(text).iterator.filter(_.nonEmpty)
    if (cfg.header && all.hasNext) { all.next(); () }
    all
  }

  private var recordNo = 0L
  private var current: InternalRow = _

  private def convert(v: InferredValue, dt: DataType): Any = (v, dt) match {
    case (NullValue, _) => null
    case (StringValue(s), StringType) => UTF8String.fromString(s)
    case (BoolValue(b), BooleanType) => b
    case (LongValue(l), LongType) => l
    case (TimestampValue(t), TimestampType) => t
    case (DoubleValue(d), DoubleType) => d
    // inferred type doesn't match the declared column type → null (the
    // server-side schema is the arbiter, like Cassandra for the reference)
    case _ => null
  }

  override def next(): Boolean = {
    while (records.hasNext) {
      recordNo += 1
      val rec =
        try QuoteCsv.parseRecord(records.next(), recordNo)
        catch { case _: CsvParseException => null }
      if (rec != null) {
        if (isRaw) {
          val cells = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            rec.map(c => InternalRow(UTF8String.fromString(c.value), c.quoted)).toArray)
          current = InternalRow(cells)
          return true
        } else {
          // infer only what the scan needs: pushed-bound columns + output
          val inferred = new Array[InferredValue](fullSchema.length)
          def cellAt(i: Int): InferredValue = {
            if (inferred(i) == null)
              inferred(i) =
                if (i < rec.length)
                  inferCell(rec(i), cfg.falseValue, cfg.trueValue, cfg.nullValue, fmt,
                    withDoubles = fullSchema.fields(i).dataType == DoubleType)
                else NullValue
            inferred(i)
          }
          val pass = bounds.forall { case (i, bound, incl) =>
            cellAt(i) match {
              case LongValue(l) => if (incl) l >= bound else l > bound
              case _ => false
            }
          }
          if (pass) {
            val row = new Array[Any](fieldIdx.length)
            var j = 0
            while (j < fieldIdx.length) {
              val i = fieldIdx(j)
              row(j) = convert(cellAt(i), fullSchema.fields(i).dataType)
              j += 1
            }
            current = InternalRow.fromSeq(row.toIndexedSeq)
            return true
          }
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
