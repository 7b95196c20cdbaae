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

  test("BmpCodec: encode/decode round-trips content bytes exactly") {
    // 100 bytes over width 16 (48 data bytes/row) → 3 rows, 44 pad zeros
    val content = Array.tabulate[Byte](100)(i => (i * 7 + 3).toByte)
    val bmp = BmpCodec.encode(content, width = 16)
    assert(bmp(0) === 'B'.toByte && bmp(1) === 'M'.toByte)
    val img = BmpCodec.decode(bmp)
    assert(img.width === 16 && img.height === 3)
    assert(img.pixels.take(100).toSeq === content.toSeq)
    assert(img.pixels.drop(100).forall(_ === 0))
  }

  test("BmpCodec: bottom-up row order is un-reversed, padding stripped") {
    // width 3 → 9 data bytes/row padded to 12; two rows of distinct
    // values prove the decoder reads stored-last rows as logical-first
    val content = (Array.fill[Byte](9)(1) ++ Array.fill[Byte](9)(2))
    val bmp = BmpCodec.encode(content, width = 3)
    // stored pixel area: row1 (2s) first, then row0 (1s), each padded
    val pixelArea = bmp.drop(54)
    assert(pixelArea.take(9).forall(_ === 2) && pixelArea.slice(12, 21).forall(_ === 1))
    val img = BmpCodec.decode(bmp)
    assert(img.pixels.toSeq === content.toSeq)
  }

  test("BmpCodec: rejects non-BMP and unsupported payloads") {
    intercept[IllegalArgumentException](BmpCodec.decode("not an image".getBytes))
    val bad = BmpCodec.encode(Array[Byte](1, 2, 3), width = 4)
    bad(28) = 8 // claim 8 bpp
    intercept[IllegalArgumentException](BmpCodec.decode(bad))
  }

  test("imageStats: channel sums from real decoded pixels match the source") {
    val docs = Seq((1L, "abcdef"), (2L, "z" * 50)).toDF("doc_id", "text")
    val stats = Multimodal.imageStats(
      Multimodal.bmpFromText(spark, docs, "doc_id", "text", width = 16))
      .collect().sortBy(_.media_id)
    // doc 1: bytes a..f -> channels B:a,d G:b,e R:c,f
    assert(stats(0).sum_b === ('a' + 'd').toLong)
    assert(stats(0).sum_g === ('b' + 'e').toLong)
    assert(stats(0).sum_r === ('c' + 'f').toLong)
    assert(stats(0).width === 16 && stats(0).height === 1 && stats(0).n_pixels === 16L)
    // doc 2: 50 'z' bytes -> positions 0,3,..,48 are B (17 of them)
    assert(stats(1).sum_b === 17L * 'z')
    assert(stats(1).sum_g === 17L * 'z')
    assert(stats(1).sum_r === 16L * 'z')
    assert(stats(1).height === 2)
  }

  test("BmpDecoder: embedding derives from real pixel intensities") {
    val black = BmpCodec.encode(Array.fill[Byte](48)(0), width = 16)
    val white = BmpCodec.encode(Array.fill[Byte](48)(-1), width = 16) // 0xFF
    val dec = new Multimodal.BmpDecoder(dim = 4)
    assert(dec.decode(black).forall(_ === 0.0f))
    assert(dec.decode(white).forall(v => math.abs(v - 1.0f) < 1e-6))
  }
}
