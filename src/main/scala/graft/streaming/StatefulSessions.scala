package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state API for semantics `session_window` can't express
  * (here: per-session event cap and a distinct-event-type count carried
  * in state). State lives per key in the state store, evicted by
  * event-time timeout tied to the watermark, so total state is bounded
  * by (active users × session struct), not by stream length.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class SessionState(
      start: Long, lastTs: Long, nEvents: Long, value: Double, types: Set[String])

  final case class SessionOut(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      session_value: Double,
      n_event_types: Int,
      capped: Boolean)

  /** Sessions close when `gapMs` passes without an event (event-time
    * timeout) or when `maxEvents` is hit (cap → emit early, reset).
    */
  def sessionize(
      events: Dataset[Event], gapMs: Long, maxEvents: Int)
    : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(out(userId, s, capped = false))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Iterator.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs && s.nEvents < maxEvents =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                    value = s.value + e.value, types = s.types + e.event_type))
                case Some(s) =>
                  closed += out(userId, s, capped = s.nEvents >= maxEvents)
                  cur = Some(SessionState(t, t, 1, e.value, Set(e.event_type)))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value, Set(e.event_type)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once the watermark passes lastTs+gap;
              // clamp to watermark+1 — a timeout at or below the current
              // watermark throws and kills the query (a straggler that
              // passed the previous batch's late-filter can otherwise
              // set lastTs+gap below a watermark that jumped this batch)
              state.setTimeoutTimestamp(
                math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result()
          }
      }
  }

  private def out(userId: Long, s: SessionState, capped: Boolean): SessionOut =
    SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastTs),
      s.nEvents, s.value, s.types.size, capped)

  // The batch reference of this semantics lives in the test tree
  // (graft.streaming.BatchReferences.sessionizeBatch): it collects its
  // input, so it must not be reachable from main.
}
