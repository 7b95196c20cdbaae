package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.Scd2

/** Streaming SCD2 dimension maintenance: each micro-batch of incoming
  * dimension rows merges into the persisted dim with textbook SCD2
  * semantics via `foreachBatch` — the standard pattern for sinks whose
  * write is a MERGE rather than an append (Structured Streaming has no
  * native SCD2 sink).
  *
  * Semantics per batch: changed keys get their old version expired
  * (`end_date = batch timestamp`) and a new current version; brand-new
  * keys insert as current; unchanged keys pass through —
  * [[graft.etl.Scd2.corrected]] exactly, with the batch's arrival time
  * as the injected clock (deterministic in tests via `clock`).
  *
  * Scale: the merge joins batch-sized input against the current dim on
  * the business key — dims broadcast under AQE; the full-history
  * rewrite per batch is the simple-file-format trade (a table format
  * with MERGE support would rewrite only matched files).
  */
object Scd2Sink {

  def start(
      spark: SparkSession,
      source: DataFrame, // streaming frame of dimension rows
      dimPath: String,
      checkpointPath: String,
      pk: String,
      trackedCols: Seq[String],
      clock: Long => Timestamp = batchId => new Timestamp(System.currentTimeMillis()),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sparkB = batch.sparkSession
        val existing =
          if (graft.etl.RawLayer.fsExists(sparkB, dimPath))
            Some(sparkB.read.parquet(dimPath))
          else None
        val merged = Scd2(
          batch.dropDuplicates(pk), existing, pk, trackedCols,
          clock(batchId), referenceSemantics = false)
        // write to a fresh dir then swap — overwriting the dir being
        // read within the same plan would truncate the input
        val tmp = dimPath + s"_b$batchId"
        merged.write.mode(SaveMode.Overwrite).parquet(tmp)
        val fs = new org.apache.hadoop.fs.Path(dimPath)
          .getFileSystem(sparkB.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(dimPath), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(dimPath))
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .start()
}
