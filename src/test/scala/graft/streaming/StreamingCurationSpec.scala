package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Dedup

class StreamingCurationSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("curateStream drops history dups, stream dups, and short docs") {
    val dir = Files.createTempDirectory("graft_scur").toString
    val historyDocs = Seq(
      (1L, "a historical document that was already kept in the corpus"))
      .toDF("doc_id", "text")
    val history = Dedup.artifacts(historyDocs, "doc_id", "text")
      .select("text_hash")

    val incoming = Seq(
      // exact dup of history → dropped
      (10L, "a historical document that was already kept in the corpus", ts("2024-01-01 10:00:00")),
      // fresh doc → kept
      (11L, "a genuinely new incoming document with its own content", ts("2024-01-01 10:01:00")),
      // exact dup of 11 within the stream → dropped
      (12L, "a genuinely new incoming document with its own content", ts("2024-01-01 10:02:00")),
      // short noise → dropped by the quality gate
      (13L, "tiny", ts("2024-01-01 10:03:00")),
      // another fresh doc → kept
      (14L, "completely different fresh material arriving on the stream", ts("2024-01-01 10:04:00")),
    ).toDF("doc_id", "text", "ts")
    incoming.write.parquet(s"$dir/src")

    val stream = spark.readStream.schema(incoming.schema).parquet(s"$dir/src")
    val curated = StreamingCuration.curateStream(
      stream, history, "doc_id", "text", "ts", horizon = "1 hour", minChars = 10)
    val q = curated.writeStream
      .format("memory").queryName("curated_docs")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val kept = spark.table("curated_docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // within-stream dedup keeps whichever copy the batch encounters
    // first (partition order) — exactly one of the 11/12 pair survives
    assert(kept.size === 2)
    assert(kept.contains(14L))
    assert(kept.intersect(Set(11L, 12L)).size === 1)
    assert(!kept.contains(10L) && !kept.contains(13L))
  }
}
