package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media is carried as an opaque `binary` payload plus typed metadata —
  * the Spark-side schema, partitioning and batch shape are real; the
  * actual codec is behind [[MediaDecoder]] because no image/audio
  * libraries ship in this environment. [[StubDecoder]] is a
  * deterministic fake (hash-derived features) so the pipeline is fully
  * testable; swapping in a real decoder changes no plumbing.
  *
  * Scale notes: decode runs in `mapPartitions` so a real decoder can
  * amortize per-partition init (model load, codec contexts) exactly
  * like a Pandas-UDF batch would. Payloads never pass through a
  * shuffle: decode immediately after the scan, project features, drop
  * the bytes.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Int,
      content_hash: Long,
      embedding: Array[Float])

  /** Per-partition decoder: bytes → fixed-size feature vector. */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decode(payload: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decode: features derived from a rolling hash of
    * the payload. Stands in for the real image/audio decode (``???``
    * territory) — see class doc.
    */
  final class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      var h = 1125899906842597L
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        out(i % dim) += (h & 0xFFFF) / 65536.0f
        i += 1
      }
      out
    }
  }

  /** Decode + feature-extract. Per-partition init of the decoder
    * mirrors a Pandas-UDF's batch lifecycle.
    */
  def extractFeatures(
      records: Dataset[MediaRecord],
      decoder: MediaDecoder = new StubDecoder()): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val emb = decoder.decode(r.payload)
        var h = 1125899906842597L
        r.payload.foreach(b => h = 31 * h + b)
        MediaFeatures(r.media_id, r.media_type, r.payload.length, h, emb)
      }
    }
  }

  /** Frame sampling for video-typed payloads: pick every `stride`-th
    * chunk of `frameBytes` as a pseudo-frame. Real frame extraction
    * swaps in at the same operator position.
    */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int, stride: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.filter(_.media_type == "video").flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by stride).map { f =>
        val slice = java.util.Arrays.copyOfRange(
          r.payload, f * frameBytes, (f + 1) * frameBytes)
        (r.media_id, f, slice)
      }
    }.toDF("media_id", "frame_no", "frame_payload")
  }

  /** Build a MediaRecord dataset from any table with a text column, for
    * testing the plumbing where no true binary media exists: payload =
    * UTF-8 bytes.
    */
  def fromText(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit("image").as("media_type"),
        col(textCol).cast("binary").as("payload"),
        lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"))
      .as[MediaRecord]
  }
}
