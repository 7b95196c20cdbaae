package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch reference implementations of the three stateful streaming
  * operators, for spec-side equivalence checks only. These collect the
  * whole (tiny, spec-built) input to the driver — which is exactly why
  * they live in src/test: the main tree stays collect-clean by
  * construction (r4 verdict task 6), and no catalog query can reach
  * them.
  */
object BatchReferences {

  /** Batch reference of [[StreamingDrift]]'s per-window type shares
    * over ALL windows (a batch frame has no open-window notion).
    */
  def typeSharesBatch(events: DataFrame, windowMs: Long): Seq[StreamingDrift.ShareOut] = {
    events.select(col("ts"), col("event_type")).collect()
      .map(r => (Math.floorDiv(r.getTimestamp(0).getTime, windowMs) * windowMs,
        r.getString(1)))
      .groupBy(_._1).toSeq
      .flatMap { case (wStart, rows) =>
        val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val total = counts.values.sum
        counts.toSeq.sortBy(_._1).map { case (tpe, n) =>
          StreamingDrift.ShareOut(new Timestamp(wStart), tpe, n, n * 1000000L / total)
        }
      }
  }

  /** Batch reference of [[StreamingFunnel]]'s in-order stage
    * progression semantics.
    */
  def progressionsBatch(events: DataFrame, stages: Seq[String]): Seq[StreamingFunnel.Advance] = {
    val stageIdx = stages.zipWithIndex.toMap
    events.select(col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => StreamingFunnel.Event(r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .groupBy(_.user_id).toSeq
      .flatMap { case (uid, evs) =>
        var cur = StreamingFunnel.FunnelState(-1, Long.MinValue)
        evs.filter(e => stageIdx.contains(e.event_type))
          .sortBy(e => (e.ts.getTime, stageIdx(e.event_type)))
          .flatMap { e =>
            val idx = stageIdx(e.event_type)
            if (idx == cur.reachedIdx + 1 && e.ts.getTime >= cur.reachedTs) {
              cur = StreamingFunnel.FunnelState(idx, e.ts.getTime)
              Some(StreamingFunnel.Advance(uid, e.event_type, idx, e.ts))
            } else None
          }
      }
  }

  /** Batch reference of [[StatefulSessions]]' gap/cap sessionization
    * semantics.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long, maxEvents: Int): Seq[StatefulSessions.SessionOut] = {
    import StatefulSessions.{Event, SessionOut, SessionState}

    def out(userId: Long, s: SessionState, capped: Boolean): SessionOut =
      SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastTs),
        s.nEvents, s.value, s.types.size, capped)

    events.select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => Event(r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
      .groupBy(_.user_id).toSeq
      .flatMap { case (uid, evs) =>
        val sorted = evs.sortBy(_.ts.getTime)
        val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var cur: Option[SessionState] = None
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastTs <= gapMs && s.nEvents < maxEvents =>
              cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                value = s.value + e.value, types = s.types + e.event_type))
            case Some(s) =>
              sessions += out(uid, s, capped = s.nEvents >= maxEvents)
              cur = Some(SessionState(t, t, 1, e.value, Set(e.event_type)))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value, Set(e.event_type)))
          }
        }
        cur.foreach(s => sessions += out(uid, s, capped = false))
        sessions
      }
  }
}
