package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec

/** Hive-style partitioned lakehouse layout — the first-line pruning
  * mechanism at 100 TB: a predicate on a partition key never opens a
  * data file outside the matching directories (it shows up as
  * `PartitionFilters:` in the formatted scan and cuts the file listing
  * itself), complementing file-level min/max skipping
  * ([[DataSkipping]], for non-partition columns) and intra-file
  * clustering ([[ZOrder]]).
  *
  * The reference writes each zone as one flat parquet directory
  * (`raw_layer.py:75-90`); a date-partitioned layout is what those
  * zones need at scale — incremental loads append a new partition
  * instead of rewriting the world, and time-scoped queries list only
  * the days they touch.
  */
object PartitionedLake {

  /** Write `df` Hive-partitioned by `keys` — low-cardinality DERIVED
    * columns (year, month, source), never a high-cardinality key: at
    * 100 TB a user-id partitioning would mint millions of tiny
    * directories and an unlistable namespace. Size partitions so each
    * holds files of ~128 MB–1 GB.
    */
  def writePartitioned(df: DataFrame, path: String, keys: String*): Unit =
    df.write.mode("overwrite").partitionBy(keys: _*).parquet(path)

  /** Read the partitioned layout back; partition-key filters applied
    * by the caller prune at directory-listing time.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Number of leaf data files the plan will actually scan — the
    * spec/audit hook proving a partition filter pruned (scanned <
    * total). Resolves the scan eagerly via the executed plan.
    */
  def filesScanned(df: DataFrame): Long =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f.selectedPartitions.totalNumberOfFiles
    }.sum
}
