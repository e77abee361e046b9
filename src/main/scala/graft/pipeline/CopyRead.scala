package graft.pipeline

import graft.{CopyConfig, Identifiers}
import graft.infer.GoTimeFormat
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `read` verb (`/root/reference/read.go:45` runReadCmd) rebuilt as a
  * Spark pipeline: source scan → offset range predicate → stringify
  * projection with typed quoting → CSV lines.
  *
  * Spark-first mapping (SURVEY.md §2A):
  *  - token-range scan + paging (#16, #18) → partitioned parquet scan
  *    (partition-per-split is exactly Cassandra's partition-per-token-range
  *    under the connector); vectorized reader subsumes paging.
  *  - `--offset` bound (#21)               → pushed-down range filter.
  *  - resume-by-token + retry (#17, #19)   → Spark task retry for batch;
  *    checkpointLocation in graft.streaming for the streaming face.
  *  - typed quoting rule (#20,
  *    `read.go:183-185`: quote iff string)  → per-column codegen'd
  *    render expressions; no row-at-a-time JVM code at all.
  */
object CopyRead {

  /** RFC-4180-escape and quote a string column (always quoted — the rule
    * for string-typed cells). */
  private def quoted(c: Column): Column =
    concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\""))

  /** Is this the tagged-union cell struct from CopyWrite.inferTagged? */
  def isTaggedCell(dt: DataType): Boolean = dt match {
    case st: StructType => st.fieldNames.sameElements(Array("tag", "s", "b", "t", "l", "d"))
    case _ => false
  }

  /** Render one column to its CSV cell per the reference's typed quoting:
    * strings quoted, everything else bare; NULL renders as cfg.nullValue,
    * bools as the configured literals, timestamps in the configured
    * layout (deviation from the reference's Go-default `%v` dump,
    * documented: this makes read→write round-trips re-infer correctly).
    * Tagged-union cells (exact-compat mode) render by their tag — the
    * faithful mirror of the reference's `quote iff *string`
    * (`read.go:183-185`). */
  def renderCell(c: Column, dt: DataType, cfg: CopyConfig): Column = {
    val pat = GoTimeFormat.toJavaPattern(cfg.timeFormat)
    val rendered: Column = dt match {
      case StringType => quoted(c)
      case BooleanType => when(c, cfg.trueValue).otherwise(cfg.falseValue)
      case TimestampType => date_format(c, pat)
      // parquet ms/us timestamps with isAdjustedToUTC=false surface as NTZ;
      // render them as session-TZ (UTC-pinned) instants so the zoned layout
      // round-trips
      case TimestampNTZType => date_format(c.cast(TimestampType), pat)
      case st if isTaggedCell(st) =>
        when(c.getField("tag") === "string", quoted(c.getField("s")))
          .when(c.getField("tag") === "bool",
            when(c.getField("b"), cfg.trueValue).otherwise(cfg.falseValue))
          .when(c.getField("tag") === "ts", date_format(c.getField("t"), pat))
          .when(c.getField("tag") === "long", c.getField("l").cast(StringType))
          .when(c.getField("tag") === "double", c.getField("d").cast(StringType))
          .otherwise(lit(cfg.nullValue))
      case _ => c.cast(StringType)
    }
    when(c.isNull, lit(cfg.nullValue)).otherwise(rendered)
  }

  /** Typed DataFrame → Dataset of CSV lines (whole projection codegen'd).
    * Each cell is coalesced to the NULL literal before joining — a NULL
    * rendered cell would otherwise be silently dropped by concat_ws,
    * shifting every later column left. */
  def toCsvLines(df: DataFrame, cfg: CopyConfig): Dataset[String] = {
    val cells = df.schema.fields.map(f =>
      coalesce(renderCell(col(f.name), f.dataType, cfg), lit(cfg.nullValue)))
    val spark = df.sparkSession
    import spark.implicits._
    df.select(concat_ws(",", cells.toSeq: _*).as("line")).as[String]
  }

  /** Header line: quoted column names, like `read.go:158-161`. */
  def headerLine(df: DataFrame): String =
    df.schema.fieldNames.map(n => "\"" + n.replace("\"", "\"\"") + "\"").mkString(",")

  /** Full verb: table → (offset-filtered, column-projected) CSV files.
    * `keyCol` plays token(): an exclusive lower bound pushed to the scan.
    * Header emission is per-output-file (the reference emits one header
    * per stream; a distributed sink has one stream per partition). */
  def run(spark: SparkSession, source: DataFrame, cols: Seq[String],
      keyCol: String, cfg: CopyConfig, outPath: String): Unit = {
    cols.foreach(Identifiers.requireIdentifier(_, "column"))
    // offset bound on a tagged cell compares its long slot (token() analog).
    // The sentinel default (Long.MinValue, like the reference's MinInt64)
    // must be a TRUE no-op: applying `key > MinValue` would still drop
    // NULL keys and non-long tagged cells.
    val filtered =
      if (cfg.offset == Long.MinValue) source
      else {
        val keyDt = source.schema(keyCol).dataType
        val key = if (isTaggedCell(keyDt)) col(keyCol).getField("l") else col(keyCol)
        source.where(key > lit(cfg.offset))
      }
    val projected = filtered.select(cols.map(col): _*)
    toCsvLines(projected, cfg).write.mode("overwrite").text(outPath)
  }
}
