package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the harness tables (TESTDATA.md). Every query receives an
  * `sfDir` and resolves tables through here, so the source seam is one
  * place — swapping parquet for a production source (e.g. a Cassandra
  * catalog, see SURVEY.md §0/§7.1) touches only this object.
  *
  * Scale note: these are plain parquet scans, so Catalyst handles column
  * pruning and predicate pushdown; nothing here materializes or caches.
  *
  * == Schema-drift guard ==
  * The harness regenerates `/root/testdata` between rounds and the
  * parquet PHYSICAL types have drifted before (events.ts
  * nanos→micros, round 8) — a class of breakage that used to surface as
  * dozens of mysterious verify failures. Every loader therefore
  * normalizes against the DECLARED logical schema below:
  *
  *   - a matching column passes through untouched (no plan impact);
  *   - a known value-preserving representation drift is fixed on read
  *     (timestamp family: nanos-as-long / NTZ / instant micros);
  *   - anything else fails IMMEDIATELY with the table, column, physical
  *     and declared type in the message — one named diff instead of a
  *     round of silent red gates.
  *
  * `SchemaGuardSpec` asserts the declared schema against all three SF
  * dirs (footer-only reads) plus forced-drift fixtures.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** AQE initial shuffle width for a session reading `sfDir`, sized to
    * the input volume. Two MEASURED operating points (r10/r11 A/Bs):
    * at decade corpora a 256-wide start is the fix for fixed-width
    * spill superlinearity (sf30 q32 246 s -> 159 s, r10); at gate SFs
    * (≤ ~20 MB parquet) the same 256 is pure map-side + cached-layout
    * tax — it regressed the whole LSH family ~1.5-2x in the r10 bench
    * (q107 3.4 -> 5.3 s; r11 CcAB decomposition: the 256-leg's cached
    * pair table carries more partitions, and every CC round's join
    * re-reads them). The 128 MB threshold separates the regimes with an
    * order of magnitude of headroom on each side; above it the width
    * also never drops below the session's own (a 100 TB session sets
    * shuffle.partitions in the thousands and keeps it). */
  def aqeInitialPartitions(sfDir: String, sessionWidth: Int): Int = {
    def bytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(bytes).sum).getOrElse(0L)
    val root = new java.io.File(sfDir)
    // A dir this java.io.File probe can't see (non-local FS, typo'd
    // path) must NOT read as "tiny input": take the CONSERVATIVE wide
    // branch — at decade scale dropping the 256 floor is the expensive
    // mistake, while an unnecessarily wide start on small data AQE
    // mostly coalesces away (r11 advice).
    if (root.exists() && bytes(root) < (128L << 20)) sessionWidth
    else math.max(256, sessionWidth)
  }

  /** The logical schema each operator compiles against — the POST-
    * normalization contract. Unadjusted-UTC parquet micros surface as
    * TIMESTAMP_NTZ (orders/lineitem, matching what DuckDB's naive
    * timestamps hash to in the oracle); events.ts is normalized to a
    * true instant TimestampType because the streaming faces watermark
    * on it. */
  val logicalSchemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  /** Physical schema drifted outside the auto-normalizable class; the
    * message names every offending column so the fix is a one-look edit
    * (update the declared schema + any op that consumed the old type). */
  final class SchemaDriftException(msg: String) extends RuntimeException(msg)

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // set for every table, not just events: if any timestamp column
    // drifts to TIMESTAMP(NANOS) the read then survives long enough for
    // normalize() to convert it (or name it) instead of the vectorized
    // reader throwing an unexplained UnsupportedOperationException
    ensureNanosAsLong(spark)
    normalize(table, spark.read.parquet(s"$sfDir/$table.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Content fingerprint of one source table's parquet, for KEYING
    * derived on-disk artifacts (BPE model, quantized embeddings): MD5
    * over the CANONICAL path plus every file's (relative name, length,
    * mtime). Two properties the old sanitized-dir-name key lacked (r11
    * advice): distinct dirs can never collide (the full canonical path
    * is hashed, not lossy-sanitized), and regenerated data at the SAME
    * path changes the key (mtime/size move), so a stale artifact is
    * never served — it is simply never looked up again. Footer-free and
    * metadata-only: listing a parquet dir is O(files), no data read. */
  def sourceFingerprint(d: String, table: String): String = {
    // r13 advice: resolve the listing through Hadoop FileSystem, not
    // java.io.File — the r12 hard-fail on java.io invisibility made
    // every artifact consumer (quant8, BPE model, the q156/q159 index
    // fixture) THROW for any non-local data dir (hdfs://, s3://)
    // instead of merely losing reuse. Hadoop FS fingerprints remote
    // paths correctly; a path that EXISTS but drifted still re-keys
    // (length/mtime move). Only when the filesystem itself is
    // unreachable do we degrade to a NO-REUSE key (fresh unique
    // artifact, never a stale one) — a missing path on a reachable FS
    // stays a hard error, since keying blind is the staleness hazard
    // the fingerprint exists to prevent.
    try {
      val path = new org.apache.hadoop.fs.Path(s"$d/$table.parquet")
      val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
      require(fs.exists(path),
        s"sourceFingerprint: $path not found — cannot key derived " +
          "artifacts safely (stale-artifact risk)")
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(path, true)
      while (it.hasNext) {
        val f = it.next()
        entries += s"${f.getPath.getName}|${f.getLen}|${f.getModificationTime}"
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val payload =
        (fs.makeQualified(path).toString +: entries.sorted.toSeq).mkString("\n")
      md.digest(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    } catch {
      case e: java.io.IOException =>
        val k = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"sourceFingerprint: filesystem for $d unreachable (${e.getMessage}) — " +
            s"degrading to no-reuse key $k (fresh artifact, no stale risk)")
        k
    }
  }

  /** Streaming scan over the same events table with the same schema
    * normalization as [[events]] — the single shared seam, so batch and
    * streaming faces can't drift. Handles both physical layouts: the
    * harness testdata ships events.parquet as a single FILE (stream the
    * parent dir, glob-filtered down to that file), while Spark-written
    * corpora (the ScaleUp probe data) have it as a DIRECTORY of part
    * files (stream the directory itself). */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    val reader = s.readStream.schema(rawSchema)
    val stream =
      if (new java.io.File(s"$d/events.parquet").isDirectory)
        reader.parquet(s"$d/events.parquet")
      else
        reader.option("pathGlobFilter", "events.parquet").parquet(d)
    normalize("events", stream)
  }

  // session-wide legacy flag (no per-read option exists for it): lets
  // TIMESTAMP(NANOS) parquet — which the vectorized reader otherwise
  // rejects — arrive as a nano LONG for [[normalize]] to convert. Set
  // once, idempotently.
  private def ensureNanosAsLong(s: SparkSession): Unit =
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Normalize `raw` to [[logicalSchemas]](table): matching columns pass
    * through; timestamp-representation drifts are converted losslessly;
    * any other drift (or a missing column) throws [[SchemaDriftException]]
    * naming every offender. Extra physical columns pass through — only
    * declared columns are contractual. */
  private[graft] def normalize(table: String, raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val declared = logicalSchemas(table)
    val physical = raw.schema
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    var out = raw
    declared.fields.foreach { f =>
      physical.find(_.name == f.name) match {
        case None =>
          errors += s"$table.${f.name}: MISSING (declared ${f.dataType.catalogString})"
        case Some(p) if p.dataType == f.dataType => // match — untouched
        case Some(p) =>
          fixup(raw, f.name, p.dataType, f.dataType) match {
            case Some(fixed) => out = out.withColumn(f.name, fixed)
            case None =>
              errors += s"$table.${f.name}: physical ${p.dataType.catalogString} " +
                s"!= declared ${f.dataType.catalogString} (no lossless rule)"
          }
      }
    }
    if (errors.nonEmpty)
      throw new SchemaDriftException(
        "testdata schema drift detected — update Tables.logicalSchemas (and " +
          "any op consuming the old type) or add a lossless fixup rule:\n  " +
          errors.mkString("\n  "))
    out
  }

  /** The whitelist of value-preserving representation fixes. Timestamp
    * family only: integer widenings etc. are deliberately NOT auto-fixed —
    * both engines would agree on the widened type, so a silent narrow-back
    * here would CREATE a gate mismatch rather than prevent one; those
    * drifts should be loud and handled by updating the declared schema. */
  private def fixup(raw: DataFrame, name: String,
      physical: DataType, declared: DataType): Option[Column] = {
    import org.apache.spark.sql.functions._
    (physical, declared) match {
      // TIMESTAMP(NANOS) parquet arrives as a nano LONG via the legacy
      // flag; integer `div`, not `/` — double division loses sub-µs
      // exactness at epoch-nano magnitudes (ulp ≈ 256ns)
      case (LongType, TimestampType) =>
        Some(timestamp_micros(expr(s"`$name` div 1000")))
      case (LongType, TimestampNTZType) =>
        Some(timestamp_micros(expr(s"`$name` div 1000")).cast(TimestampNTZType))
      // NTZ↔instant casts reinterpret wall-clock in the SESSION time
      // zone; value-preserving only under UTC — enforce it here rather
      // than trusting every entry point to have pinned it
      case (TimestampNTZType, TimestampType) | (TimestampType, TimestampNTZType) =>
        val tz = raw.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"column $name needs a ${physical.catalogString} -> " +
            s"${declared.catalogString} cast, which shifts values unless " +
            s"spark.sql.session.timeZone is UTC (found '$tz')")
        Some(col(name).cast(declared))
      case _ => None
    }
  }
}
