package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Streaming ANN index maintenance: a stream of embedding rows appends
  * into a persisted sign-IVF index via `foreachBatch` — the serving
  * loop a 100 TB training-data pipeline actually runs (vectors arrive
  * continuously; the index must absorb them without retraining or
  * rewriting).
  *
  * EXACTLY-ONCE comes from composing two contracts. Structured
  * Streaming re-runs a failed micro-batch with the SAME `batchId`; the
  * r10 batch-keyed append ([[Similarity.appendSignIvfIndex]]) is
  * idempotent per batch id — a replay overwrites its own
  * `batch_id=sb<id>` shards instead of double-appending. Idempotent
  * sink + replayable checkpointed source = exactly-once index
  * maintenance, the textbook foreachBatch discipline, and precisely
  * the property the pre-r10 merge-and-swap append could NOT offer
  * (its replay silently doubled the batch's rows).
  *
  * The structural quantizer makes the append order-free (assignment
  * depends only on the vector), so the served result after any run is
  * identical to a one-shot rebuild over everything ingested — the spec
  * pins stream(B, C) ≡ rebuild(A ∪ B ∪ C) bit-for-bit. Bootstrap the
  * index with [[Similarity.buildSignIvfIndex]] over the historical
  * corpus first; run [[Similarity.compactSignIvfIndex]] on the usual
  * compaction cadence to fold per-micro-batch generations.
  */
object StreamingAnnIndex {

  def start(
      source: DataFrame, // streaming frame with (idCol, vecCol)
      indexPath: String,
      checkpointPath: String,
      dim: Int,
      bits: Int = 7,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // empty micro-batches write nothing (an empty generation dir
        // would be harmless, but there is no reason to mint one)
        if (!batch.isEmpty)
          Similarity.appendSignIvfIndex(batch, indexPath, s"sb$batchId",
            dim, bits, idCol, vecCol)
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .start()
}
