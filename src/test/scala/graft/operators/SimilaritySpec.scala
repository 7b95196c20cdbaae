package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  // 4 unit-ish vectors: 1≈2 (same direction), 3 orthogonal, 4 opposite
  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), "x"),
    (2L, Array(0.9f, 0.1f, 0.0f), "x"),
    (3L, Array(0.0f, 1.0f, 0.0f), "y"),
    (4L, Array(-1.0f, 0.0f, 0.0f), "y"),
  ).toDF("vec_id", "embedding", "label")

  test("bruteForceTopK: nearest neighbor of v1 is v2, farthest is v4") {
    val q = corpus.filter($"vec_id" === 1L)
    val out = Similarity.bruteForceTopK(q, corpus, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(2L, 3L, 4L))
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
  }

  test("bruteForceTopK excludes the query itself") {
    val q = corpus.filter($"vec_id" === 1L)
    val out = Similarity.bruteForceTopK(q, corpus, k = 4).collect()
    assert(!out.map(_.getAs[Long]("neighbor_id")).contains(1L))
  }

  test("knnLabel: majority label among k nearest") {
    // neighbors of v1 at k=3: v2(x), v3(y), v4(y) → y wins 2:1
    val q = corpus.filter($"vec_id" === 1L)
    val out = Similarity.knnLabel(q, corpus, k = 3).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("predicted_label") === "y")
    assert(out.head.getAs[Long]("votes") === 2L)
  }

  test("lshTopK: recovers the exact nearest neighbor for clustered vectors") {
    // vectors in the same half-space collide in hyperplane buckets with
    // high probability over 4 tables; v1/v2 are near-identical.
    val q = corpus.filter($"vec_id" === 1L)
    val out = Similarity.lshTopK(q, corpus, k = 1, dim = 3).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("neighbor_id") === 2L)
  }
}
