package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-time temporal join (Flink's "temporal table join",
  * kdb's streaming aj): enrich an event stream with the most recent
  * reference value per key as of each event's OWN timestamp — the
  * steady-state form of [[graft.operators.AsOfJoin]] when the
  * dimension arrives as a CDC stream instead of a table.
  *
  * Correctness under out-of-order arrival is the hard part: a naive
  * "enrich with whatever reference is current at processing time"
  * gives non-deterministic, arrival-order-dependent results. Here an
  * event is held in state until the WATERMARK passes its timestamp;
  * only then is its enrichment final, because any reference update
  * that could still affect it (ref.ts ≤ event.ts ≤ watermark) would
  * be late beyond the allowed delay and is dropped by Spark before
  * reaching the operator. Emission is therefore deterministic for
  * any arrival interleaving within the watermark delay — the spec
  * proves streamed output ≡ the batch as-of reference.
  *
  * Scale posture: state per key = the latest compacted reference +
  * only the events/refs younger than the watermark (bounded by delay
  * × per-key rate, like any watermarked stateful op). References
  * older than the watermark fold into ONE (ts, value) pair per key —
  * a reference stream of any length occupies O(#keys) state.
  */
object StreamingTemporalJoin {

  final case class Event(key: Long, ts: Timestamp, payload: String)
  final case class RefUpdate(key: Long, ts: Timestamp, ref_value: Double)
  final case class Enriched(key: Long, ts: Timestamp, payload: String,
      ref_value: Option[Double], ref_ts: Option[Timestamp])

  // not `private`: Spark's generated SafeProjection cannot access
  // private classes (janino "Private member cannot be accessed")
  final case class Tagged(
      key: Long, ts: Timestamp, is_ref: Boolean, ref_value: Double, payload: String)

  /** (lastRef compacted below watermark) + pending young rows.
    * Lists hold (epochMs, value/payload) pairs, kept sorted on use.
    */
  final case class St(
      hasRef: Boolean, lastRefTs: Long, lastRefVal: Double,
      pendRefs: List[(Long, Double)], pendEvents: List[(Long, String)])

  private val emptySt = St(hasRef = false, 0L, 0.0, Nil, Nil)

  /** @param delay watermark delay (e.g. "10 minutes"): the maximum
    *   out-of-orderness after which late rows are dropped; also the
    *   enrichment latency (an event emits once the watermark passes it)
    */
  def enrich(events: Dataset[Event], refs: Dataset[RefUpdate], delay: String)
    : Dataset[Enriched] = {
    import events.sparkSession.implicits._
    val tagged = events
      .select(col("key"), col("ts"), lit(false).as("is_ref"),
        lit(Double.NaN).as("ref_value"), col("payload"))
      .unionByName(refs.select(col("key"), col("ts"), lit(true).as("is_ref"),
        col("ref_value"), lit("").as("payload")))
      .withWatermark("ts", delay)
      .as[Tagged]
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[St, Enriched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[St]) =>
          val prev = state.getOption.getOrElse(emptySt)
          val (newRefs, newEvents) =
            if (state.hasTimedOut) (Nil, Nil)
            else {
              val rs = rows.toSeq
              (rs.filter(_.is_ref).map(r => (r.ts.getTime, r.ref_value)).toList,
                rs.filterNot(_.is_ref).map(r => (r.ts.getTime, r.payload)).toList)
            }
          val wm = state.getCurrentWatermarkMs()
          // deterministic total orders: refs by (ts, value) — at equal
          // ts the larger value wins LOCF (documented tie-break);
          // events by (ts, payload) for stable emission order
          val allRefs = (prev.pendRefs ++ newRefs).sorted
          val allEvents = (prev.pendEvents ++ newEvents).sorted
          val (ripe, stillPending) = allEvents.partition(_._1 <= wm)
          // walk refs and ripe events in lockstep (both sorted):
          // classic merge — O(n log n) in the batch, no quadratic scan
          var curHas = prev.hasRef
          var curTs = prev.lastRefTs
          var curVal = prev.lastRefVal
          var remaining = allRefs
          val outRows = ripe.map { case (evTs, payload) =>
            while (remaining.nonEmpty && remaining.head._1 <= evTs) {
              curHas = true; curTs = remaining.head._1; curVal = remaining.head._2
              remaining = remaining.tail
            }
            Enriched(key, new Timestamp(evTs), payload,
              if (curHas) Some(curVal) else None,
              if (curHas) Some(new Timestamp(curTs)) else None)
          }
          // compact every ref at or below the watermark into lastRef:
          // no future emittable event can need an older one
          while (remaining.nonEmpty && remaining.head._1 <= wm) {
            curHas = true; curTs = remaining.head._1; curVal = remaining.head._2
            remaining = remaining.tail
          }
          state.update(St(curHas, curTs, curVal, remaining, stillPending))
          if (stillPending.nonEmpty)
            // wake when the watermark passes the oldest buffered event
            // (its ts > wm by construction, as setTimeoutTimestamp requires)
            state.setTimeoutTimestamp(stillPending.head._1)
          outRows.iterator
      }
  }
}
