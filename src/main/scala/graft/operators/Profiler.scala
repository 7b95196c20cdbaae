package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass dataset profiling — the "do I trust this corpus" primitive
  * a 100 TB ingest needs before any training run: per-group row counts,
  * null counts, exact distinct cardinalities, and numeric ranges, all
  * from a SINGLE groupBy (one shuffle, map-side partial aggregation).
  * Exact `count_distinct` is deliberate at this granularity: the
  * distinct sets are per-group and the expand it plans is bounded by
  * the declared column list; corpus-wide distinct-of-high-cardinality
  * profiling should use approx_count_distinct instead (documented, not
  * defaulted, because the driver oracle hash-compares exact values).
  */
object Profiler {

  /** Profile `df` grouped by `groupCol`:
    *  - `n_rows`
    *  - `nulls_<c>` for each of `nullCols`
    *  - `distinct_<c>` (exact) for each of `distinctCols`
    *  - `min_<c>` / `max_<c>` for each of `minMaxCols`
    * All counts are BIGINT — engine-portable for the value oracle.
    */
  def profile(
      df: DataFrame, groupCol: String,
      nullCols: Seq[String] = Nil,
      distinctCols: Seq[String] = Nil,
      minMaxCols: Seq[String] = Nil): DataFrame = {
    val aggs =
      nullCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")) ++
      distinctCols.map(c => count_distinct(col(c)).as(s"distinct_$c")) ++
      minMaxCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Fixed-width histogram per group: bucket = ⌊value / width⌋ (one
    * IEEE division + floor — deterministic on any engine), counted.
    * One groupBy pass; empty buckets are absent (dense ranges should
    * be filled by the consumer, not shuffled as zeros).
    */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      width: Double): DataFrame = {
    require(width > 0, s"histogram: width must be positive, got $width")
    df.groupBy(col(groupCol),
        floor(col(valueCol) / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
