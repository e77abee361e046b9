package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness tables (TESTDATA.md). Every query receives an
  * `sfDir` and resolves tables through here, so the source seam is one
  * place — swapping parquet for a production source (e.g. a Cassandra
  * catalog, see SURVEY.md §0/§7.1) touches only this object.
  *
  * Scale note: these are plain parquet scans, so Catalyst handles column
  * pruning and predicate pushdown; nothing here materializes or caches.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    if (table == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy flag) and convert to a
    * microsecond TimestampType column — lossless for this data and keeps
    * every downstream op on a native timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    normalizeEventTs(s.read.parquet(s"$d/events.parquet"))
  }

  /** Streaming scan over the same events table with the same ts handling
    * as [[events]] — the single shared seam, so batch and streaming faces
    * can't drift. Handles both physical layouts: the harness testdata
    * ships events.parquet as a single FILE (stream the parent dir,
    * glob-filtered down to that file), while Spark-written corpora (the
    * ScaleUp probe data) have it as a DIRECTORY of part files (stream the
    * directory itself). */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    val reader = s.readStream.schema(rawSchema)
    val stream =
      if (new java.io.File(s"$d/events.parquet").isDirectory)
        reader.parquet(s"$d/events.parquet")
      else
        reader.option("pathGlobFilter", "events.parquet").parquet(d)
    normalizeEventTs(stream)
  }

  // session-wide legacy flag (no per-read option exists for it). Set
  // once, idempotently: repeated set() on every call is a write to
  // shared session state — harmless here but racy as a library pattern
  // if another thread snapshots conf mid-call.
  private def ensureNanosAsLong(s: SparkSession): Unit =
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  // Normalize `ts` to a session-TZ TimestampType whatever the physical
  // layout: TIMESTAMP(NANOS) parquet arrives as a nano LONG (via the
  // legacy flag above; integer `div`, not `/` — double division loses
  // sub-µs exactness at epoch-nano magnitudes, ulp ≈ 256ns), plain
  // TIMESTAMP(MICROS) without tz arrives as TIMESTAMP_NTZ (cast is
  // value-preserving — every entry point pins session TZ to UTC), and
  // Spark-written corpora (ScaleUp probes) are already TimestampType.
  private def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
