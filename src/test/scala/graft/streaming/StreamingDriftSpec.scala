package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingDriftSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val hourMs = 3600 * 1000L

  test("closed windows emit exact ppm shares matching the batch reference") {
    val dir = Files.createTempDirectory("drift_stream").toString
    val early = Seq(
      (ts("2024-01-01 10:05:00"), "click"),
      (ts("2024-01-01 10:15:00"), "click"),
      (ts("2024-01-01 10:25:00"), "view")
    ).toDF("ts", "event_type")
    val late = Seq((ts("2024-01-01 13:00:00"), "click")).toDF("ts", "event_type")
    early.write.parquet(s"$dir/src/b1")
    late.write.parquet(s"$dir/src/b2")

    val stream = spark.readStream.schema(early.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/src/*")
    val q = StreamingDrift.typeShares(stream, hourMs, watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("drift_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(q.exception.isEmpty, q.exception.toString)

    val streamed = spark.sql("SELECT * FROM drift_mem")
      .as[StreamingDrift.ShareOut].collect().toSet
    val expectedAll = BatchReferences.typeSharesBatch(early.unionByName(late), hourMs).toSet
    // closed-window rows must be a subset of the batch reference and
    // exactly correct; the 13:00 window stays open at end-of-stream
    assert(streamed.subsetOf(expectedAll), s"streamed=$streamed")
    val w10 = streamed.filter(_.window_start == ts("2024-01-01 10:00:00"))
    assert(w10 === Set(
      StreamingDrift.ShareOut(ts("2024-01-01 10:00:00"), "click", 2L, 666666L),
      StreamingDrift.ShareOut(ts("2024-01-01 10:00:00"), "view", 1L, 333333L)),
      s"10:00 window must close with exact integer shares, got $w10")
    spark.sql("DROP TABLE IF EXISTS drift_mem")
  }

  test("batch reference: shares are exact floor ppm and sum <= 1e6 per window") {
    val events = Seq(
      (ts("2024-01-01 09:10:00"), "a"), (ts("2024-01-01 09:20:00"), "b"),
      (ts("2024-01-01 09:30:00"), "c")).toDF("ts", "event_type")
    val out = BatchReferences.typeSharesBatch(events, hourMs)
    assert(out.map(_.ppm).sum <= 1000000L)
    assert(out.forall(_.ppm == 333333L))
  }
}
