package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.AsOfJoin

class StreamingTemporalJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming temporal join ≡ batch as-of under out-of-order arrival and restarts") {
    val base = Files.createTempDirectory("ttj").toString
    def appendEvents(rows: (Long, Timestamp, String)*): Unit =
      rows.toDF("key", "ts", "payload")
        .coalesce(1).write.mode("append").parquet(s"$base/ev")
    def appendRefs(rows: (Long, Timestamp, Double)*): Unit =
      rows.toDF("key", "ts", "ref_value")
        .coalesce(1).write.mode("append").parquet(s"$base/ref")

    // run 1: events arrive BEFORE the reference rows that must enrich
    // them (k2's ref, k1's second ref are still in flight)
    appendEvents(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (2L, ts("2024-01-01 10:30:00"), "c"),
      (3L, ts("2024-01-01 10:30:00"), "e"))
    appendRefs(
      (1L, ts("2024-01-01 09:30:00"), 1.0),
      (3L, ts("2024-01-01 10:00:00"), 3.0))

    def runOnce(): Unit = {
      val evs = spark.readStream
        .schema(spark.read.parquet(s"$base/ev").schema).parquet(s"$base/ev")
        .as[StreamingTemporalJoin.Event]
      val refs = spark.readStream
        .schema(spark.read.parquet(s"$base/ref").schema).parquet(s"$base/ref")
        .as[StreamingTemporalJoin.RefUpdate]
      val q = StreamingTemporalJoin.enrich(evs, refs, delay = "2 hours")
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/chk")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(90000)
      assert(q.exception.isEmpty, q.exception.toString)
    }
    runOnce()

    // run 2: out-of-order arrivals — a ref whose EVENT TIME precedes
    // k2's already-arrived event, a second ref for k1 between its two
    // events, a late event for k2, and a same-ts duplicate ref for k3
    // (tie-break coverage). All within the 2 h watermark delay.
    appendRefs(
      (2L, ts("2024-01-01 10:15:00"), 5.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0),
      (3L, ts("2024-01-01 10:00:00"), 7.0))
    appendEvents((2L, ts("2024-01-01 09:10:00"), "d"))
    runOnce()

    // runs 3–4: far-future sentinels push the watermark past every
    // real row so buffered events reach finality and emit (the same
    // two-append pattern the interval-join spec needs)
    appendEvents((99L, ts("2024-01-02 00:00:00"), "zz"))
    appendRefs((99L, ts("2024-01-02 00:00:00"), 0.0))
    runOnce()
    appendEvents((98L, ts("2024-01-03 00:00:00"), "zz"))
    appendRefs((98L, ts("2024-01-03 00:00:00"), 0.0))
    runOnce()

    val streamed = spark.read.parquet(s"$base/out")
      .filter($"key" < 90)
      .select($"key", $"ts", $"payload", $"ref_value", $"ref_ts")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet

    // batch reference: the as-of join over the same (real) rows.
    // k3 is excluded there — its same-ts duplicate ref makes the
    // batch window's pick order-dependent; the streaming tie-break is
    // documented (larger value wins) and asserted explicitly below.
    val evDf = spark.read.parquet(s"$base/ev").filter($"key" < 90 && $"key" =!= 3L)
    val refDf = spark.read.parquet(s"$base/ref").filter($"key" < 90 && $"key" =!= 3L)
    val expected = AsOfJoin.asofJoin(evDf, refDf, "key", "ts", "ts",
        Seq("ref_value", "ts"), prefix = "r_")
      .select($"key", $"ts", $"payload", $"r_ref_value", $"r_ts")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet

    assert(streamed.filter(_._1 != 3L) === expected,
      s"streamed=${streamed.filter(_._1 != 3L)}\nexpected=$expected")
    // the specific out-of-order facts, stated directly:
    assert(streamed.contains((2L, ts("2024-01-01 10:30:00"), "c",
      Some(5.0), Some(ts("2024-01-01 10:15:00")))),
      "ref arriving AFTER the event but event-time-before must enrich it")
    assert(streamed.contains((2L, ts("2024-01-01 09:10:00"), "d", None, None)),
      "late event before any ref must emit unenriched")
    assert(streamed.contains((1L, ts("2024-01-01 11:00:00"), "b",
      Some(2.0), Some(ts("2024-01-01 10:30:00")))),
      "second ref must supersede the first for later events only")
    // documented tie-break: equal-ts refs resolve to the larger value
    assert(streamed.contains((3L, ts("2024-01-01 10:30:00"), "e",
      Some(7.0), Some(ts("2024-01-01 10:00:00")))))
  }
}
