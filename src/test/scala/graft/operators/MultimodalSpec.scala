package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def media = {
    val docs = Seq(
      (1L, "hello world payload"),
      (2L, "hello world payload"),
      (3L, "a different payload")).toDF("doc_id", "text")
    Multimodal.fromText(spark, docs, "doc_id", "text")
  }

  test("fromText builds typed MediaRecords with UTF-8 payloads") {
    val rows = media.collect().sortBy(_.media_id)
    assert(rows.length === 3)
    assert(rows.head.media_type === "image")
    assert(new String(rows.head.payload, "UTF-8") === "hello world payload")
  }

  test("extractFeatures: deterministic, equal payloads → equal features") {
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f.map(_.media_id).toSeq === Seq(1L, 2L, 3L))
    assert(f(0).content_hash === f(1).content_hash)
    assert(f(0).embedding.toSeq === f(1).embedding.toSeq)
    assert(f(0).content_hash !== f(2).content_hash)
    assert(f(0).byte_len === "hello world payload".length)
    assert(f(0).embedding.length === 16)
  }

  test("custom decoder dimension flows through") {
    val f = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(dim = 4))
      .head()
    assert(f.embedding.length === 4)
  }

  test("sampleFrames: video payload chunks by frame size and stride") {
    val videos = Seq((7L, "image", "x" * 100), (8L, "video", "y" * 100))
      .toDF("doc_id", "mt", "text")
    val recs = Multimodal.fromText(spark, videos.select($"doc_id", $"text"), "doc_id", "text")
      .map(r => r.copy(media_type = if (r.media_id == 8L) "video" else "image"))
    val frames = Multimodal.sampleFrames(recs, frameBytes = 10, stride = 2).collect()
    // only the video row contributes: 10 frames, every 2nd → 5
    assert(frames.map(_.getLong(0)).distinct.toSeq === Seq(8L))
    assert(frames.length === 5)
    assert(frames.head.getAs[Array[Byte]]("frame_payload").length === 10)
  }
}
