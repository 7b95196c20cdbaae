package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Similarity

class StreamingAnnIndexSpec extends SparkSpec {

  import spark.implicits._

  test("streaming sign-IVF maintenance ≡ one-shot rebuild; micro-batch replay is exactly-once") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = e.filter($"vec_id" % 3 =!= 0)
    val restB = e.filter($"vec_id" % 3 === 0 && $"vec_id" % 2 === 0)
    val restC = e.filter($"vec_id" % 3 === 0 && $"vec_id" % 2 =!= 0)
    val root = Files.createTempDirectory("graft_stream_ann").toString
    val idx = s"$root/idx"
    val srcDir = s"$root/src"
    Similarity.buildSignIvfIndex(base, idx, dim = 64, bits = 7)
    val schema = e.schema
    // two source files arriving across two stream runs sharing one
    // checkpoint — Structured Streaming assigns them distinct batch ids
    restB.write.mode("append").parquet(srcDir)
    val q1 = StreamingAnnIndex.start(
      spark.readStream.schema(schema).parquet(srcDir), idx, s"$root/ckpt", dim = 64)
    q1.awaitTermination(60000)
    assert(q1.exception.isEmpty, s"q1 failed: ${q1.exception}")
    restC.write.mode("append").parquet(srcDir)
    val q2 = StreamingAnnIndex.start(
      spark.readStream.schema(schema).parquet(srcDir), idx, s"$root/ckpt", dim = 64)
    q2.awaitTermination(60000)
    assert(q2.exception.isEmpty, s"q2 failed: ${q2.exception}")
    // the structural quantizer makes maintenance order-free: the
    // stream-maintained index serves exactly what a one-shot rebuild
    // over everything ingested serves
    val oneShot = s"$root/one"
    Similarity.buildSignIvfIndex(e, oneShot, dim = 64, bits = 7)
    val queries = e.filter($"vec_id" % 50 === 0)
    def serve(p: String) = Similarity.querySignIvfIndex(spark, p, queries,
      k = 5, dim = 64, bits = 7, nProbe = 48)
      .orderBy("query_id", "rank").collect().toSeq
    assert(serve(idx) === serve(oneShot),
      "stream-maintained index must serve the one-shot rebuild's exact result")
    // exactly-once under replay: re-running a micro-batch's append with
    // its batch id (what Structured Streaming does after a sink crash)
    // leaves the index bit-identical — the contract the batch-keyed
    // layout exists for
    val rowsBefore = spark.read.parquet(s"$idx/lists").count()
    Similarity.appendSignIvfIndex(restC, idx, "sb1", dim = 64, bits = 7)
    assert(spark.read.parquet(s"$idx/lists").count() === rowsBefore,
      "replayed micro-batch must not grow the index")
    assert(serve(idx) === serve(oneShot))
  }
}
