package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(spark, sf).limit(20)

  test("withImageMeta attaches typed metadata struct per binary asset") {
    val out = Multimodal.withImageMeta(media, "content")
    assert(out.schema("image_meta").dataType == Multimodal.imageMetaSchema)
    val r = out.select("image_meta.width", "image_meta.height", "image_meta.format").head()
    assert(r.getInt(0) >= 64 && r.getInt(1) >= 64)
    assert(Set("jpeg", "png").contains(r.getString(2)))
  }

  test("withFeatures produces array<float> ready for ANN, deterministic") {
    val a = Multimodal.withFeatures(media, "content", dim = 16)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val b = Multimodal.withFeatures(media, "content", dim = 16)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(a == b, "stub featurizer must be deterministic")
    assert(a.values.forall(_.length == 16))
  }

  test("withResized scales payloads toward the target dim, idempotent when small") {
    val out = Multimodal.withResized(media, "content", targetDim = 128)
      .select($"media_id", length($"content").as("orig"), length($"resized").as("res"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (orig, res) = (r.getAs[Int]("orig"), r.getAs[Int]("res"))
      assert(res <= orig, s"resize must never grow the payload ($orig -> $res)")
      assert(res > 0)
    }
    // determinism: same input -> byte-identical output
    val a = Multimodal.withResized(media, "content", 128).select($"resized").collect().map(_.getAs[Array[Byte]](0).toSeq)
    val b = Multimodal.withResized(media, "content", 128).select($"resized").collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("explodeFrames yields frame rows with indices") {
    val out = Multimodal.explodeFrames(media, "content", framesPerVideo = 4)
    assert(out.count() == 80)
    val idx = out.filter($"media_id" === 0).select("frame_idx").as[Int].collect().sorted.toSeq
    assert(idx == Seq(0, 1, 2, 3))
    assert(out.schema("frame").dataType.typeName == "binary")
  }
}
