package graft.multimodal

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.withFakeMedia(
    // orderBy before limit: a bare limit's row set depends on scan
    // order and the three actions below must see the SAME 60 docs
    Tables.load(spark, sfDir, "documents").orderBy("doc_id").limit(60))

  test("decodeFeatures: batched decode is total and deterministic") {
    val f1 = Multimodal.decodeFeatures(spark, media).collect()
    val f2 = Multimodal.decodeFeatures(spark, media).collect()
    assert(f1.length == 60)
    assert(f1.map(_.doc_id).toSet == f2.map(_.doc_id).toSet)
    val a = f1.sortBy(_.doc_id).map(_.features.toSeq).toSeq
    val b = f2.sortBy(_.doc_id).map(_.features.toSeq).toSeq
    assert(a == b)
    assert(f1.forall(_.features.length == 8))
  }

  test("frameSample: 1-to-N explode over video payloads only") {
    val frames = Multimodal.frameSample(spark, media,
      stride = 2, frameBytes = 32).collect()
    val videoIds = media.filter(col("meta.mediaType") === "video")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.doc_id).toSet == videoIds)
    // frame indices follow the stride and every video yields >= 1 frame
    assert(frames.forall(_.frame_idx % 2 == 0))
    val perDoc = frames.groupBy(_.doc_id).map(_._2.length)
    assert(perDoc.forall(_ >= 1))
    // expected count is derivable from payload size
    val sizes = media.filter(col("meta.mediaType") === "video")
      .select(col("doc_id"), octet_length(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    frames.groupBy(_.doc_id).foreach { case (id, fs) =>
      val nFrames = math.max(1, sizes(id) / 32)
      assert(fs.length == (0 until nFrames by 2).size)
    }
  }

  test("resize: image rows transform, audio/video pass through untouched") {
    val r = Multimodal.resize(media, 32, 16)
    val img = r.filter(col("meta.mediaType") === "image")
      .select(col("meta.width"), col("meta.height"),
        col("meta.nBytes"), octet_length(col("payload"))).collect()
    assert(img.nonEmpty)
    assert(img.forall(x => x.getInt(0) == 32 && x.getInt(1) == 16))
    assert(img.forall(x => x.getLong(2) == x.getInt(3).toLong))
    assert(img.forall(_.getInt(3) <= 32 * 16 * 3))
    // non-image rows keep their payload bytes and dimensions
    val before = media.filter(col("meta.mediaType") =!= "image")
      .select(col("doc_id"), octet_length(col("payload")),
        col("meta.width")).collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2)))).toMap
    r.filter(col("meta.mediaType") =!= "image")
      .select(col("doc_id"), octet_length(col("payload")),
        col("meta.width")).collect().foreach { x =>
        assert(before(x.getLong(0)) == ((x.getInt(1), x.getInt(2))))
      }
    // resized payloads still decode in the batched stage
    val f = Multimodal.decodeFeatures(spark, r).collect()
    assert(f.length == 60)
  }
}
