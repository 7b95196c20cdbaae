package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming composition-drift monitor — the live form of the drift
  * family (q130 snapshot ppm, q137 day-over-day ppm): per event-time
  * window, the exact integer ppm share of each category, emitted ONCE
  * when the watermark closes the window.
  *
  * A windowed-count + share computation needs the window TOTAL, which
  * in a streaming plan would be a second stateful aggregation over the
  * first one; keying `flatMapGroupsWithState` by window-start instead
  * keeps it one stateful operator whose state is a small count map per
  * OPEN window (closed windows are evicted by event-time timeout), so
  * state is bounded by (open windows × categories), never stream
  * length. Shares are exact `n·10⁶ div total` BIGINTs — the same
  * engine-portable arithmetic as the batch drift operators.
  */
object StreamingDrift {

  final case class TypedEvent(ts: Timestamp, event_type: String)

  final case class ShareOut(
      window_start: Timestamp, event_type: String, n: Long, ppm: Long)

  /** @param events        frame with `ts` (timestamp) and `event_type`
    * @param windowMs      tumbling window length in millis
    * @param watermarkDelay lateness horizon; windows emit when the
    *                       watermark passes their end
    */
  def typeShares(
      events: DataFrame, windowMs: Long,
      watermarkDelay: String = "30 minutes"): Dataset[ShareOut] = {
    require(windowMs > 0, "windowMs must be positive")
    import events.sparkSession.implicits._
    events.select(col("ts"), col("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[TypedEvent]
      .groupByKey(e => Math.floorDiv(e.ts.getTime, windowMs) * windowMs)
      .flatMapGroupsWithState[Map[String, Long], ShareOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (wStart, it, state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            val total = counts.values.sum
            // deterministic emission order; the sink may reorder, but
            // tests and replays see a stable sequence
            counts.toSeq.sortBy(_._1).iterator.map { case (tpe, n) =>
              ShareOut(new Timestamp(wStart), tpe, n, n * 1000000L / total)
            }
          } else {
            val merged = it.foldLeft(
              state.getOption.getOrElse(Map.empty[String, Long])) { (m, e) =>
              m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
            }
            state.update(merged)
            // close when the watermark passes the window end; clamp to
            // watermark+1 (the StatefulSessions straggler rule — a
            // timeout at or below the current watermark kills the query)
            state.setTimeoutTimestamp(
              math.max(wStart + windowMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  // The batch reference of this arithmetic lives in the test tree
  // (graft.streaming.BatchReferences.typeSharesBatch): it collects its
  // input, so it must not be reachable from main.
}
