package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2B): image/audio/video as opaque
  * `binary` columns with typed metadata, plus batched decode /
  * feature-extract / resize / frame-sample plumbing.
  *
  * The container has no codec libraries, so the DECODE STEP IS A STUB —
  * [[FakeCodec]] produces deterministic pseudo-decodes derived from the
  * payload bytes (clearly marked; swap for a real codec at the single
  * seam). Everything Spark-side is real and tested: the schema, the
  * typed Dataset, the per-partition batched processing shape (the Scala
  * analog of a batched/vectorized UDF: decode amortized per batch, not
  * per row), the partitioning, and the feature vectors, which are real
  * byte-histogram computations consumable by graft.ops.Similarity.
  *
  * Scale: payloads stay opaque binary end-to-end (no driver collect, no
  * string round-trip); per-partition batching keeps codec state (here a
  * cheap fake, in production a decoder context) amortized; metadata-only
  * queries never touch the bytes column thanks to parquet column pruning.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      source: String, lang: String)

  /** Decoded descriptor (what a real codec would return). */
  final case class Decoded(
      media_id: Long, kind: String, width: Int, height: Int,
      n_channels: Int, duration_ms: Long, n_bytes: Long)

  /** DETERMINISTIC FAKE CODEC — stands in for image/audio/video libs that
    * are not in this container. Every value is a pure function of the
    * payload, so tests and the correctness gate are stable. Replace this
    * object to integrate a real decoder; nothing else changes. */
  object FakeCodec {
    private def mix(bytes: Array[Byte], salt: Long): Long = {
      var h = salt * 0x9e3779b97f4a7c15L
      var i = 0
      while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
      h & Long.MaxValue
    }
    def decode(r: MediaRow): Decoded = {
      val h = mix(r.payload, 1)
      Decoded(r.media_id, r.kind,
        width = (h % 1920 + 64).toInt,
        height = (h / 7 % 1080 + 64).toInt,
        n_channels = if (r.kind == "audio") 2 else 3,
        duration_ms = if (r.kind == "image") 0L else h % 600000L,
        n_bytes = r.payload.length.toLong)
    }
    /** Fake resize: deterministic downscale preserving aspect flag. */
    def resize(d: Decoded, maxDim: Int): Decoded = {
      val scale = math.min(1.0, maxDim.toDouble / math.max(d.width, d.height))
      d.copy(width = (d.width * scale).toInt, height = (d.height * scale).toInt)
    }
    /** Fake frame sampling: k deterministic frame offsets for video. */
    def sampleFrames(d: Decoded, k: Int): Seq[Long] =
      if (d.duration_ms <= 0) Seq(0L)
      else (0 until k).map(i => d.duration_ms * i / k)
  }

  /** Build the media table from documents: payload = utf8 bytes of the
    * text (deterministic fake payload), kind round-robins image/audio/
    * video. In production this is `spark.read.format("binaryFile")` or a
    * parquet table with a binary column — same schema. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        col("source"), col("lang"))
      .as[MediaRow]
  }

  /** Batched decode: per-partition, in fixed-size batches — the Scala
    * analog of a vectorized UDF's batch shape (codec context amortized
    * across the batch; here FakeCodec is stateless but the seam is the
    * point). */
  def decodeAll(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch: a real codec would init once here
        batch.map(FakeCodec.decode)
      }
    }
  }

  /** Feature extraction: 16-dim byte-histogram embedding (REAL math over
    * the fake payload) — normalized bucket frequencies, consumable by
    * cosine similarity ops. */
  def features(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val hist = new Array[Float](16)
        r.payload.foreach(b => hist((b & 0xFF) / 16) += 1f)
        val n = math.max(1, r.payload.length).toFloat
        (r.media_id, r.kind, hist.map(_ / n))
      }
    }.toDF("media_id", "kind", "embedding")
  }

  /** Metadata-only query — oracle-checked: per kind, object count and
    * total payload bytes. Column pruning keeps the payload column unread
    * on the Spark side where possible (length() needs it; the count path
    * doesn't). */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).groupBy(col("kind"))
      .agg(count(lit(1)).as("n_objects"),
        sum(length(col("payload"))).as("total_bytes"),
        max(length(col("payload"))).as("max_bytes"))
      .orderBy(col("kind"))

  val mediaMetaSql: String =
    """SELECT kind, count(*) AS n_objects,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
      |FROM (SELECT doc_id,
      |        ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |        text
      |      FROM documents)
      |GROUP BY kind ORDER BY kind""".stripMargin

  /** Decode + resize + frame-sample pipeline, summarized per kind —
    * deterministic through the fake codec → rows-only gate + ScalaTest. */
  def decodeSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = decodeAll(mediaTable(s, d))
    val resized = dec.map(dv => FakeCodec.resize(dv, 512))
    resized.map(dv => (dv.kind, dv.width.toLong.max(dv.height.toLong),
        FakeCodec.sampleFrames(dv, 4).length.toLong))
      .toDF("kind", "max_dim", "n_frames")
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        max(col("max_dim")).as("largest_dim"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("kind"))
  }
}
