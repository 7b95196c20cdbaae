package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingFunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val stages = Seq("view", "click", "purchase")

  private def events = Seq(
    // user 1 completes in order
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    // user 2 clicks before viewing — that click must not advance
    (2L, ts("2024-01-01 09:00:00"), "click"),
    (2L, ts("2024-01-01 09:30:00"), "view"),
    (2L, ts("2024-01-01 09:45:00"), "click"),
    // user 3: same-instant view+click chain (inclusive semantics)
    (3L, ts("2024-01-01 11:00:00"), "click"),
    (3L, ts("2024-01-01 11:00:00"), "view"),
    // user 4: non-stage events only
    (4L, ts("2024-01-01 08:00:00"), "error")
  ).toDF("user_id", "ts", "event_type")

  test("streaming funnel advancements match the batch reference") {
    val dir = Files.createTempDirectory("funnel_state").toString
    events.write.parquet(s"$dir/src")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/src")
      .withWatermark("ts", "10 minutes")
      .as[StreamingFunnel.Event]
    val q = StreamingFunnel.progressions(stream, stages, idleMs = 3600000L)
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(q.exception.isEmpty)
    val streamed = spark.sql("SELECT * FROM funnel_adv")
      .as[StreamingFunnel.Advance].collect().toSet
    val expected = BatchReferences.progressionsBatch(events, stages).toSet
    assert(streamed === expected, s"streamed=$streamed\nexpected=$expected")
    spark.sql("DROP TABLE IF EXISTS funnel_adv")
  }

  test("cross-batch: a completed funnel does not re-enter, progress spans batches") {
    val dir = Files.createTempDirectory("funnel_xbatch").toString
    // file 1: user 10 completes the funnel; user 11 views
    Seq((10L, ts("2024-01-01 10:00:00"), "view"),
      (10L, ts("2024-01-01 10:01:00"), "click"),
      (10L, ts("2024-01-01 10:02:00"), "purchase"),
      (11L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type").coalesce(1).write.parquet(s"$dir/src")
    // file 2 (separate micro-batch via maxFilesPerTrigger=1): user 10
    // views AGAIN — must NOT restart the funnel; user 11 clicks —
    // must advance using state carried across batches
    Seq((10L, ts("2024-01-01 10:30:00"), "view"),
      (11L, ts("2024-01-01 10:31:00"), "click"))
      .toDF("user_id", "ts", "event_type").coalesce(1).write.mode("append")
      .parquet(s"$dir/src")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/src")
      .withWatermark("ts", "10 minutes")
      .as[StreamingFunnel.Event]
    val q = StreamingFunnel.progressions(stream, stages, idleMs = 3600000L)
      .writeStream.format("memory").queryName("funnel_xb")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(q.exception.isEmpty)
    val adv = spark.sql("SELECT * FROM funnel_xb").as[StreamingFunnel.Advance]
      .collect().toSeq
    // user 10: exactly one advancement per stage, nothing after completion
    assert(adv.count(_.user_id == 10L) === 3,
      s"completed funnel re-entered: ${adv.filter(_.user_id == 10L)}")
    // user 11: view in batch 1, click in batch 2 — state crossed batches
    assert(adv.filter(_.user_id == 11L).map(_.stage).toSet === Set("view", "click"))
    spark.sql("DROP TABLE IF EXISTS funnel_xb")
  }

  test("batch reference: order enforced, ties advance, stage counts match Funnel") {
    val adv = BatchReferences.progressionsBatch(events, stages)
    // user 1 full funnel, user 2 view→click only (the 09:00 click is
    // pre-view), user 3 same-instant chain, user 4 nothing
    assert(adv.count(_.stage_idx == 0) === 3)
    assert(adv.count(_.stage_idx == 1) === 3)
    assert(adv.count(_.stage_idx == 2) === 1)
    val u2 = adv.filter(_.user_id == 2L).map(a => (a.stage, a.ts)).toMap
    assert(u2("click") === ts("2024-01-01 09:45:00"),
      "the pre-view click must not have advanced the funnel")
    // per-stage counts agree with the batch Funnel operator
    val counts = graft.operators.Funnel.funnel(
        events.toDF(), "user_id", "event_type", "ts", stages)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(counts === Map("view" -> 3L, "click" -> 3L, "purchase" -> 1L))
  }

  test("Funnel.reachTimes ≡ the streaming batch reference, record for record") {
    val distributed = graft.operators.Funnel.reachTimes(
        events, "user_id", "event_type", "ts", stages)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2).toInt, r.getTimestamp(3)))
      .toSet
    val reference = BatchReferences.progressionsBatch(events, stages)
      .map(a => (a.user_id, a.stage, a.stage_idx, a.ts)).toSet
    assert(distributed === reference)
  }
}
