package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.LanguageModel

/** Streaming LM-quality screen: the ingest-side counterpart of q184 —
  * documents arrive continuously and each micro-batch is scored
  * against a FROZEN [[LanguageModel.BigramLm]] (trained offline on the
  * trusted corpus, the CCNet deployment shape), graded keep/drop, and
  * appended to a batch-keyed parquet zone.
  *
  * Batch boundaries cannot change a score: a document's bigrams live
  * entirely in its own row and the model is static, so scoring is
  * per-document pure — stream ingestion over ANY micro-batch split
  * produces row-for-row the same grades as one-shot batch scoring
  * (spec-pinned). That is why `foreachBatch` + batch scoring is the
  * correct plan here and a watermarked streaming aggregation is not:
  * there is no cross-document state to manage.
  *
  * EXACTLY-ONCE is the [[StreamingAnnIndex]] discipline: Structured
  * Streaming replays a failed micro-batch under the SAME `batchId`,
  * and [[scoreAndWrite]] lands each batch in its own
  * `ingest_batch=b<id>/` partition with mode overwrite — a replay
  * rewrites its own partition instead of appending a duplicate.
  * Idempotent sink + checkpointed replayable source = exactly-once.
  *
  * The graded zone keeps EVERY row with a `keep` flag rather than
  * filtering: the drop side is the screen's audit trail (what was
  * rejected and why — by score or by the too-short class), and
  * downstream consumers filter `keep` at read time for free via
  * predicate pushdown.
  */
object StreamingQuality {

  /** Score one batch and land it under `outPath/ingest_batch=b<id>/`
    * (string-prefixed so partition-column inference cannot re-type the
    * key). The graded rows carry EVERY source column of the batch (the
    * grade columns join back onto the full rows by id) — the zone is a
    * landing zone, so the kept documents must be readable from it
    * after the transient stream source retires, and the drop side must
    * contain the rejected content, not bare ids. Public so a
    * crash-replay is testable directly: calling this twice with one
    * batchId leaves the zone bit-identical (given a frozen model —
    * [[start]] freezes it).
    */
  def scoreAndWrite(
      batch: DataFrame, lm: LanguageModel.BigramLm, outPath: String,
      batchId: Long, minFluencyPpm: Long, minBigrams: Long,
      idCol: String, textCol: String): Unit = {
    val grades = LanguageModel.scoreFluencyPpm(batch, lm, idCol, textCol)
      .withColumn("keep",
        col("n_bigrams") >= minBigrams && col("fluency_ppm") >= minFluencyPpm)
    batch.join(grades, Seq(idCol))
      .write.mode("overwrite")
      .parquet(s"$outPath/ingest_batch=b$batchId")
  }

  def start(
      source: DataFrame, // streaming frame with (idCol, textCol)
      lm: LanguageModel.BigramLm,
      outPath: String,
      checkpointPath: String,
      minFluencyPpm: Long,
      minBigrams: Long = 1L,
      idCol: String = "doc_id",
      textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // freeze the model ONCE before the stream starts: the count frames
    // are materialized so (a) no micro-batch re-runs the training
    // aggregation over the corpus, and (b) the grades a replayed batch
    // id rewrites cannot drift even if the training TABLE gains rows
    // mid-stream — without this, exactly-once would only hold for a
    // never-changing training source. A parquet-backed model
    // ([[LanguageModel.load]]) is already frozen; checkpointing it
    // again is harmless.
    val frozen = lm.copy(
      bigramCounts = lm.bigramCounts.localCheckpoint(),
      prefixCounts = lm.prefixCounts.localCheckpoint())
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          scoreAndWrite(batch, frozen, outPath, batchId, minFluencyPpm,
            minBigrams, idCol, textCol)
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .start()
  }
}
