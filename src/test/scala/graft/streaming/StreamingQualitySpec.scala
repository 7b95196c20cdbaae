package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.length

import graft.SparkSpec
import graft.operators.LanguageModel

class StreamingQualitySpec extends SparkSpec {

  import spark.implicits._

  test("stream-scored grades ≡ one-shot batch scoring across arbitrary micro-batch splits; replay idempotent") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val lm = LanguageModel.train(
      docs.filter($"doc_id" % 5 =!= 0), "doc_id", "text")
    val root = Files.createTempDirectory("graft_stream_q").toString
    val srcDir = s"$root/src"
    val out = s"$root/graded"
    val schema = docs.schema
    // two source files across two runs on one checkpoint → two batch ids
    docs.filter($"doc_id" % 2 === 0).write.mode("append").parquet(srcDir)
    val q1 = StreamingQuality.start(
      spark.readStream.schema(schema).parquet(srcDir), lm, out,
      s"$root/ckpt", minFluencyPpm = 34000L)
    q1.awaitTermination(60000)
    assert(q1.exception.isEmpty, s"q1 failed: ${q1.exception}")
    docs.filter($"doc_id" % 2 =!= 0).write.mode("append").parquet(srcDir)
    val q2 = StreamingQuality.start(
      spark.readStream.schema(schema).parquet(srcDir), lm, out,
      s"$root/ckpt", minFluencyPpm = 34000L)
    q2.awaitTermination(60000)
    assert(q2.exception.isEmpty, s"q2 failed: ${q2.exception}")

    def graded(path: String) = spark.read.parquet(path)
      .select("doc_id", "n_bigrams", "n_oov", "fluency_ppm", "keep")
      .orderBy("doc_id").collect().toSeq
    val streamed = graded(out)
    assert(streamed.map(_.getLong(0)).toSet ===
      docs.select("doc_id").as[Long].collect().toSet,
      "every ingested document must be graded exactly once")

    // batch twin: scoring is per-document pure, so the split is invisible
    val batchOut = s"$root/batch"
    StreamingQuality.scoreAndWrite(docs, lm, batchOut, 0L,
      minFluencyPpm = 34000L, minBigrams = 1L, "doc_id", "text")
    assert(streamed === graded(batchOut),
      "micro-batch boundaries must not change any grade")

    // replay: rerunning a batch id overwrites its own partition
    val before = streamed
    StreamingQuality.scoreAndWrite(docs.filter($"doc_id" % 2 === 0), lm, out, 0L,
      minFluencyPpm = 34000L, minBigrams = 1L, "doc_id", "text")
    assert(graded(out) === before, "a replayed micro-batch must not duplicate grades")

    // the gate grades both drop classes: below-threshold and too-short
    val byKeep = spark.read.parquet(out).groupBy("keep").count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byKeep.getOrElse(true, 0L) > 0L, "some documents must pass the screen")
    assert(byKeep.getOrElse(false, 0L) > 0L, "some documents must be dropped by the screen")

    // the zone is a LANDING zone: every source column survives grading
    // (kept docs must be readable after the stream source retires, and
    // the drop-side audit trail must contain the rejected content)
    val zone = spark.read.parquet(out)
    assert(zone.columns.contains("text"), "graded zone must retain the document text")
    assert(zone.filter($"text".isNull).count() === 0L)
    assert(zone.filter(!$"keep" && length($"text") > 0).count() > 0L,
      "the drop side must carry the rejected content, not bare ids")
  }

  test("replay after model retrain: the frozen model keeps replayed grades bit-identical (VERDICT r10 #8)") {
    import graft.operators.LanguageModel
    val root = java.nio.file.Files.createTempDirectory("graft_sq_retrain").toString
    val modelPath = s"$root/model"
    val fluent = (0L until 20L).map(i =>
      i -> "the cat sat on the mat and the dog ran to the cat").toDF("doc_id", "text")
    LanguageModel.save(LanguageModel.train(fluent, "doc_id", "text"), modelPath)
    val lm = LanguageModel.load(spark, modelPath)
    // exactly what start() does before the first micro-batch
    val frozen = lm.copy(
      bigramCounts = lm.bigramCounts.localCheckpoint(),
      prefixCounts = lm.prefixCounts.localCheckpoint())
    val batch = Seq(100L -> "the cat sat on the mat",
      101L -> "zq wv xj kp").toDF("doc_id", "text")
    val out = s"$root/zone"
    def zone = spark.read.parquet(out).orderBy("doc_id").collect().toSeq
    StreamingQuality.scoreAndWrite(batch, frozen, out, 7L,
      minFluencyPpm = 30000L, minBigrams = 1L, "doc_id", "text")
    val before = zone
    // the artifact RETRAINS underneath: overwrite with a disjoint
    // corpus (different vocabulary, different V) at the same path
    val retrained = (0L until 20L).map(i =>
      i -> "zq wv xj kp zq wv xj kp").toDF("doc_id", "text")
    LanguageModel.save(LanguageModel.train(retrained, "doc_id", "text"), modelPath)
    // crash-replay of the same ingest batch id against the frozen model
    StreamingQuality.scoreAndWrite(batch, frozen, out, 7L,
      minFluencyPpm = 30000L, minBigrams = 1L, "doc_id", "text")
    assert(zone === before,
      "a replayed batch id must rewrite the SAME grades across a retrain")
    // and the retrained artifact genuinely grades differently — the
    // hazard the freeze exists for (keep flags flip for both docs)
    val lm2 = LanguageModel.load(spark, modelPath)
    val fNew = LanguageModel.scoreFluencyPpm(batch, lm2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val fOld = before.map(r => r.getLong(0) ->
      r.getLong(before.head.fieldIndex("fluency_ppm"))).toMap
    assert(fNew(100L) < fOld(100L), "fluent doc must score lower under the disjoint retrain")
    assert(fNew(101L) > fOld(101L), "garbage doc must score higher under its own retrain")
  }
}
