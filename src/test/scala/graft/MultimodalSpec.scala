package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{Decoded, FakeCodec, MediaRow}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema, batched decode shape, deterministic fake
  * codec, and real feature math. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("graft-mm-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("media table schema: opaque binary + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val f = m.schema.fields.map(x => x.name -> x.dataType.typeName).toMap
    assert(f("payload") == "binary")
    assert(f("kind") == "string" && f("media_id") == "long")
    assert(m.count() > 0)
  }

  test("decode is deterministic and batch-shaped; resize bounds dims") {
    val dec = Multimodal.decodeAll(Multimodal.mediaTable(spark, sf), batchSize = 7)
      .collect().sortBy(_.media_id)
    val dec2 = Multimodal.decodeAll(Multimodal.mediaTable(spark, sf), batchSize = 64)
      .collect().sortBy(_.media_id)
    assert(dec.map(_.width).toSeq == dec2.map(_.width).toSeq) // batch size can't change results
    dec.foreach { d =>
      assert(d.width >= 64 && d.height >= 64)
      assert(if (d.kind == "audio") d.n_channels == 2 else d.n_channels == 3)
      assert(d.kind != "image" || d.duration_ms == 0L)
      val r = FakeCodec.resize(d, 512)
      assert(math.max(r.width, r.height) <= 512 || math.max(d.width, d.height) <= 512)
    }
  }

  test("frame sampling: k offsets within duration, image → single frame") {
    val img = Decoded(1, "image", 100, 100, 3, 0, 10)
    assert(FakeCodec.sampleFrames(img, 4) == Seq(0L))
    val vid = Decoded(2, "video", 100, 100, 3, 60000, 10)
    val frames = FakeCodec.sampleFrames(vid, 4)
    assert(frames.length == 4 && frames.forall(o => o >= 0 && o < 60000))
  }

  test("features: 16-dim normalized byte histogram, unit mass") {
    val feats = Multimodal.features(Multimodal.mediaTable(spark, sf))
    val row = feats.orderBy(col("media_id")).first()
    val v = row.getAs[scala.collection.Seq[Float]]("embedding")
    assert(v.length == 16)
    assert(math.abs(v.sum - 1.0f) < 1e-3) // histogram normalized by payload length
  }
}
