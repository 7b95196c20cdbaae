package graft.streaming

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
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
  * as the injected clock (deterministic in tests via `clock`). When a
  * batch carries several versions of one key, `orderCol` picks the
  * latest deterministically.
  *
  * Durability: the swap renames the previous dim to `<dim>_prev` before
  * renaming the new output into place, and the reader falls back to
  * `_prev` — so a crash between the two renames loses nothing; the
  * replayed batch re-merges against the previous state. Rename results
  * are checked (HDFS rename reports failure by returning false, not by
  * throwing). A table format with atomic MERGE (the production choice)
  * slots in behind the same foreachBatch.
  *
  * Scale: the merge joins batch-sized input against the current dim on
  * the business key — dims broadcast under AQE; the full-history
  * rewrite per batch is the simple-file-format trade.
  */
object Scd2Sink {

  def start(
      source: DataFrame, // streaming frame of dimension rows
      dimPath: String,
      checkpointPath: String,
      pk: String,
      trackedCols: Seq[String],
      orderCol: Option[String] = None,
      clock: Long => Timestamp = batchId => new Timestamp(System.currentTimeMillis()),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions._
        val sparkB = batch.sparkSession
        val prevPath = dimPath + "_prev"
        val existing =
          if (graft.etl.RawLayer.fsExists(sparkB, dimPath))
            Some(sparkB.read.parquet(dimPath))
          else if (graft.etl.RawLayer.fsExists(sparkB, prevPath))
            Some(sparkB.read.parquet(prevPath)) // crash-recovery fallback
          else None
        // one row per key, deterministically: latest by orderCol when
        // given; otherwise dropDuplicates (arbitrary pick — fine only
        // when batches can't contain two versions of a key)
        val perKey = orderCol match {
          case Some(oc) =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col(pk)).orderBy(col(oc).desc)
            batch.withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1).drop("__rn")
          case None => batch.dropDuplicates(pk)
        }
        val merged = Scd2(perKey, existing, pk, trackedCols,
          clock(batchId), referenceSemantics = false)
        // write to a fresh dir, keep the old dim as _prev until the new
        // one is in place, then drop _prev
        val tmp = new Path(dimPath + s"_b$batchId")
        merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val fs = tmp.getFileSystem(sparkB.sparkContext.hadoopConfiguration)
        val dim = new Path(dimPath)
        val prev = new Path(prevPath)
        // Clear _prev only when dim exists to take its place: when dim
        // is ABSENT (crash recovery), _prev is the only durable copy of
        // the history and must survive until the new dim is in place.
        if (fs.exists(dim)) {
          // a false delete would make the next rename nest dim INSIDE
          // the stale _prev — check it like the renames
          if (fs.exists(prev) && !fs.delete(prev, true))
            throw new java.io.IOException(s"delete stale $prev failed")
          if (!fs.rename(dim, prev))
            throw new java.io.IOException(s"rename $dim -> $prev failed")
        }
        if (!fs.rename(tmp, dim))
          throw new java.io.IOException(s"rename $tmp -> $dim failed")
        fs.delete(prev, true)
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .start()
}
