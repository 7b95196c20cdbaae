package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StatefulSessionsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
    (1L, ts("2024-01-01 10:10:00"), "view", 2.0),
    (1L, ts("2024-01-01 12:00:00"), "click", 3.0), // >30min gap → new session
    (2L, ts("2024-01-01 10:00:00"), "click", 1.0),
    (2L, ts("2024-01-01 10:01:00"), "click", 1.0),
    (2L, ts("2024-01-01 10:02:00"), "click", 1.0), // maxEvents=3 cap here
    (2L, ts("2024-01-01 10:03:00"), "click", 1.0), // → new session
  ).toDF("user_id", "ts", "event_type", "value")

  private val gapMs = 30 * 60 * 1000L

  test("streaming flatMapGroupsWithState sessions match the batch reference") {
    val dir = Files.createTempDirectory("sess_state").toString
    events.write.parquet(s"$dir/src")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/src")
      .withWatermark("ts", "10 minutes")
      .as[StatefulSessions.Event]
    val q = StatefulSessions.sessionize(stream, gapMs, maxEvents = 3)
      .writeStream.format("memory").queryName("state_sess")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(q.exception.isEmpty)
    val streamed = spark.sql("SELECT * FROM state_sess").as[StatefulSessions.SessionOut]
      .collect().toSet
    val expectedAll = BatchReferences.sessionizeBatch(events, gapMs, maxEvents = 3).toSet
    // append mode emits sessions closed by arriving data within the run;
    // sessions still open at end-of-stream stay in state (their timeout
    // fires on a later batch) — so streamed ⊆ batch, and every CLOSED
    // session matches the batch reference exactly.
    assert(streamed.subsetOf(expectedAll),
      s"streamed=$streamed\nexpected⊆$expectedAll")
    // the mid-stream closures (user 1 first session, user 2 capped
    // session) must have been emitted
    assert(streamed.exists(s => s.user_id == 1L && s.n_events == 2 && s.n_event_types == 2))
    assert(streamed.exists(s => s.user_id == 2L && s.n_events == 3 && s.capped))
    spark.sql("DROP TABLE IF EXISTS state_sess")
  }

  test("batch reference semantics: gap split, cap split, type counting") {
    val out = BatchReferences.sessionizeBatch(events, gapMs, maxEvents = 3)
    val u1 = out.filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(u1.map(_.n_events) === Seq(2L, 1L))
    assert(u1.head.n_event_types === 2)
    val u2 = out.filter(_.user_id == 2L).sortBy(_.session_start.getTime)
    assert(u2.map(_.n_events) === Seq(3L, 1L))
    assert(u2.head.capped)
  }

  test("dedupStream drops duplicate keys within the watermark") {
    val dir = Files.createTempDirectory("dedup_stream").toString
    val dup = Seq(
      (10L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (10L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (11L, ts("2024-01-01 10:05:00"), "view", 2.0),
    ).toDF("user_id", "ts", "event_type", "value")
    dup.write.parquet(s"$dir/src")
    val stream = spark.readStream.schema(dup.schema).parquet(s"$dir/src")
    val q = EventStreams.dedupStream(stream, "1 hour", "user_id", "ts")
      .writeStream.format("memory").queryName("dedup_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(q.exception.isEmpty)
    assert(spark.sql("SELECT * FROM dedup_mem").count() === 2)
    spark.sql("DROP TABLE IF EXISTS dedup_mem")
  }
}
