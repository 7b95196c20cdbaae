package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping — the manifest pattern behind every
  * lakehouse table format, built from nothing but parquet + a stats
  * frame. Three pieces:
  *
  *  1. [[writeClustered]] range-partitions on the skip column before
  *     writing, so each file owns a TIGHT, near-disjoint value range
  *     (the same "cluster so min/max prunes" motivation as
  *     [[ZOrder.clusterByZ]], in one dimension).
  *  2. [[buildManifest]] computes per-file (min, max, rows) in ONE scan
  *     keyed by `input_file_name()` — manifest size is #files, not
  *     #rows.
  *  3. [[prunedRead]] keeps only files whose [min,max] interval
  *     overlaps the queried [lo,hi], reads just those paths, and
  *     re-applies the predicate for rows the coarse file ranges let
  *     through.
  *
  * The result is provably identical to the full-scan filter (q104's
  * oracle is the plain predicate over the original table — the q90
  * "optimization must be invisible" discipline); the win at 100 TB is
  * that a selective time-window query opens `overlapping/total` of the
  * files instead of all of them. The manifest collect is #files rows on
  * the driver — exactly what Delta/Iceberg planners hold in memory; at
  * 1M files that is megabytes, and the manifest itself should be
  * persisted and incrementally maintained rather than rebuilt (the
  * build is provided here because the sandbox writes fresh snapshots
  * per run).
  *
  * The skip column is cast to LONG in the manifest (epoch seconds, ids,
  * day numbers) — integer bounds compare identically everywhere,
  * sidestepping float/interval ordering edge cases in file stats.
  */
object DataSkipping {

  /** Range-cluster `df` on `clusterCol` into `nFiles` parquet files
    * under `outDir`. repartitionByRange samples the column to build
    * balanced range bounds, so files end up near-equal-sized with
    * near-disjoint value ranges — the layout min/max skipping needs.
    */
  def writeClustered(df: DataFrame, clusterCol: String, outDir: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(clusterCol))
      .write.mode("overwrite").parquet(outDir)

  /** Per-file stats manifest: (file, min_v, max_v, n_rows) over
    * `statsCol` cast to LONG. One scan of the table, #files output
    * rows, map-side combinable.
    */
  def buildManifest(spark: SparkSession, dataDir: String, statsCol: String): DataFrame =
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(statsCol).cast("long")).as("min_v"),
        max(col(statsCol).cast("long")).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Read only the files whose [min_v, max_v] overlaps [lo, hi], with
    * the exact predicate re-applied. Returns the frame plus
    * (keptFiles, totalFiles) so callers — and specs — can assert the
    * skip actually skipped.
    */
  def prunedRead(
      spark: SparkSession, dataDir: String, statsCol: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    require(lo <= hi, s"empty interval: [$lo, $hi]")
    val manifest = buildManifest(spark, dataDir, statsCol).collect()
    val kept = manifest.filter { r =>
      !(r.getAs[Long]("max_v") < lo || r.getAs[Long]("min_v") > hi)
    }.map(_.getAs[String]("file"))
    val pred = col(statsCol).cast("long").between(lo, hi)
    val df =
      if (kept.isEmpty) spark.read.parquet(dataDir).filter(pred).limit(0)
      else spark.read.parquet(kept.toIndexedSeq: _*).filter(pred)
    (df, kept.length, manifest.length)
  }
}
