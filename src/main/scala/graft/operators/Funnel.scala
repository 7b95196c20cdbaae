package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis over an event log: how many users
  * reached stage i, where stage i counts only events at-or-after the
  * moment stage i−1 was first reached (the standard product-analytics
  * semantics; stages are assumed to be distinct event types).
  *
  * Execution shape: stage i's reach set is `events ⋈ reached(i−1)` on
  * the user key followed by a min-timestamp aggregate — one hash
  * shuffle per stage on a monotonically SHRINKING user set, never a
  * per-user event sort, so a 3-stage funnel over 100 TB of events is
  * 3 bounded hash joins. The per-stage counts are exact BIGINTs and
  * the whole computation is SQL-expressible for the driver oracle.
  */
object Funnel {

  /** One row per stage: (stage, stage_idx, n_users). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(
      col(userCol).as("__user"), col(typeCol).as("__type"), col(tsCol).as("__ts"))
    // reached(i): users with first qualifying time of stage i
    val reached = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val candidates = prev match {
          case None => base.filter(col("__type") === stage)
          case Some(p) =>
            base.filter(col("__type") === stage)
              .join(p.select(col("__user"), col("__t").as("__tprev")), Seq("__user"))
              .filter(col("__ts") >= col("__tprev"))
        }
        Some(candidates.groupBy("__user").agg(min(col("__ts")).as("__t")))
    }.flatten
    val counts = reached.zip(stages).zipWithIndex.map {
      case ((r, stage), i) =>
        r.agg(count(lit(1)).as("n_users"))
          .select(lit(stage).as("stage"), lit(i.toLong).as("stage_idx"),
            col("n_users"))
    }
    counts.reduce(_.unionByName(_)).orderBy(col("stage_idx"))
  }
}
