package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel progression via `flatMapGroupsWithState` — the
  * live counterpart of [[graft.operators.Funnel.funnel]]: as each user
  * advances through the ordered stage list (stage i counted only
  * at-or-after stage i−1's reach time), an advancement record is
  * emitted downstream, where a windowed count per stage gives the live
  * funnel. State per user is two longs (highest stage reached + its
  * event time) — bounded by active users, evicted by event-time
  * timeout `idleMs` past the last advancement.
  *
  * Ordering caveat (inherent to streaming funnels): events are sorted
  * within each micro-batch, and the watermark bounds cross-batch
  * disorder — an event arriving later than the allowed lateness cannot
  * retroactively advance a stage, exactly like any watermarked
  * stateful operator.
  */
object StreamingFunnel {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)

  final case class FunnelState(reachedIdx: Int, reachedTs: Long)

  final case class Advance(user_id: Long, stage: String, stage_idx: Int, ts: Timestamp)

  def progressions(
      events: Dataset[Event], stages: Seq[String], idleMs: Long)
    : Dataset[Advance] = {
    require(stages.nonEmpty, "progressions: at least one stage")
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Advance](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state: GroupState[FunnelState]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (userId, it, state: GroupState[FunnelState]) =>
          var cur = state.getOption.getOrElse(FunnelState(-1, Long.MinValue))
          val out = Iterator.newBuilder[Advance]
          // within-batch order: event time, then stage order for ties
          // (a view and a click at the same instant advance both)
          it.toSeq
            .filter(e => stageIdx.contains(e.event_type))
            .sortBy(e => (e.ts.getTime, stageIdx(e.event_type)))
            .foreach { e =>
              val idx = stageIdx(e.event_type)
              val t = e.ts.getTime
              if (idx == cur.reachedIdx + 1 && t >= cur.reachedTs) {
                cur = FunnelState(idx, t)
                out += Advance(userId, e.event_type, idx, e.ts)
              }
            }
          if (cur.reachedIdx >= 0) {
            // completed funnels KEEP their state until the idle timeout
            // evicts it — removing on completion would let the same
            // user re-enter at stage 0 in the next micro-batch and
            // double-count, making output depend on batch boundaries
            state.update(cur)
            state.setTimeoutTimestamp(
              math.max(cur.reachedTs + idleMs, state.getCurrentWatermarkMs() + 1))
          }
          out.result()
      }
  }

  // The batch reference of this semantics lives in the test tree
  // (graft.streaming.BatchReferences.progressionsBatch): it collects
  // its input, so it must not be reachable from main.
}
