package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document curation: the incremental-ingest counterpart of
  * [[graft.operators.Dedup.dedupeIncrement]] for a continuously
  * arriving corpus. A document stream is scored, filtered, and
  * exact-deduplicated both against the already-kept HISTORY
  * (stream-static anti-join on the content hash — the static side is
  * the compact artifact table, never the text) and within the stream
  * itself (`dropDuplicatesWithinWatermark`, state bounded by the
  * event-time horizon).
  *
  * Near-dup candidates can't be verified inside a streaming plan
  * (banded self-joins need the full batch); route survivors through
  * `foreachBatch` + `Dedup.dedupeIncrement` when fuzzy dedup must be
  * inline, or run it as the periodic batch compaction — both
  * compose with this operator unchanged.
  */
object StreamingCuration {

  /** Filter + hash + dedup a streaming document frame.
    *
    * @param stream        streaming frame with `idCol`, `textCol`, `tsCol`
    * @param historyHashes static frame with a `text_hash` column (from
    *                      [[graft.operators.Dedup.artifacts]])
    * @param horizon       how late a duplicate may arrive and still be
    *                      suppressed — bounds the dedup state
    * @param minChars      quality gate: drop docs shorter than this
    */
  def curateStream(
      stream: DataFrame, historyHashes: DataFrame,
      idCol: String, textCol: String, tsCol: String,
      horizon: String, minChars: Int = 1): DataFrame =
    stream
      .filter(length(col(textCol)) >= minChars)
      .withColumn("text_hash", md5(col(textCol).cast("binary")))
      .join(historyHashes.select(col("text_hash")), Seq("text_hash"), "left_anti")
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("text_hash")
}
