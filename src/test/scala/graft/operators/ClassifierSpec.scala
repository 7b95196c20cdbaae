package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  test("one GD iteration matches the hand computation exactly") {
    // Two rows, bias-only: y = (1, 0), x0 = 10⁶.
    // w = 0 ⇒ z = 0 ⇒ σ = 500000 ⇒ err = (−500000, +500000).
    // Σ err·x0 = 0 ⇒ w stays 0. Add a discriminative feature x1 =
    // (10⁶, 0): Σ err·x1 = −5·10¹¹; with lr = 4, n = 2:
    // Δw1 = trunc(4·(−5·10¹¹) / (2·10⁶)) = −10⁶ ⇒ w1 = +10⁶.
    val feat = Seq((1L, 1L, 1000000L, 1000000L), (2L, 0L, 1000000L, 0L))
      .toDF("id", "label", "x0", "x1")
    val m = Classifier.trainLogistic(feat, Seq("x0", "x1"), "label", iters = 1)
    assert(m.weights.toSeq === Seq(0L, 1000000L))
    // scoring with w1 = 10⁶: row 1 z = 10⁶ ⇒ σ = 500000 + 250000;
    // row 2 z = 0 ⇒ σ = 500000 (≥ threshold ⇒ predicted 1)
    val scored = Classifier.scoreLogistic(feat, m, Seq("x0", "x1"))
      .orderBy("id").select("score_ppm", "predicted").collect()
    assert(scored(0).getLong(0) === 750000L)
    assert(scored(0).getLong(1) === 1L)
    assert(scored(1).getLong(0) === 500000L)
  }

  test("training separates a linearly separable class and is partition-stable") {
    val feat = (0L until 400L).map { i =>
      val y = if (i % 2 == 0) 1L else 0L
      // positives live high on x1, negatives low, with deterministic jitter
      val x1 = if (y == 1L) 700000L + (i % 7) * 1000L else 200000L + (i % 5) * 1000L
      (i, y, 1000000L, x1)
    }.toDF("id", "label", "x0", "x1")
    val m = Classifier.trainLogistic(feat, Seq("x0", "x1"), "label", iters = 10)
    val scored = Classifier.scoreLogistic(feat, m, Seq("x0", "x1"))
    val acc = scored.filter(col("predicted") === col("label")).count()
    assert(acc === 400L, s"separable classes must classify cleanly, got $acc/400")
    val m2 = Classifier.trainLogistic(
      feat.repartition(13), Seq("x0", "x1"), "label", iters = 10)
    assert(m2.weights.toSeq === m.weights.toSeq,
      "integer gradient sums must be partition-order independent")
  }

  test("docFeatures: hand-checked ppm features; empty text is all-zero but bias") {
    val docs = Seq(
      (1L, "the cat is on the mat"), // 6 tokens, 3 en-stopwords; 16 alpha / 21 chars
      (2L, "")).toDF("doc_id", "text")
    val f = Classifier.docFeatures(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(f(0).getLong(1) === 1000000L)
    assert(f(0).getLong(2) === 500000L) // 3/6 stopwords
    assert(f(0).getLong(3) === 16L * 1000000L / 21L)
    assert(f(0).getLong(4) === 21L * 500L)
    assert(f(1).getLong(2) === 0L)
    assert(f(1).getLong(3) === 0L)
    assert(f(1).getLong(4) === 0L)
  }

  test("validation fails loud") {
    val feat = Seq((1L, 1L, 1000000L)).toDF("id", "label", "x0")
    intercept[IllegalArgumentException](
      Classifier.trainLogistic(feat, Seq("x0"), "label", iters = 0))
    intercept[IllegalArgumentException](
      Classifier.trainLogistic(feat.limit(0), Seq("x0"), "label", iters = 1))
    intercept[IllegalArgumentException](
      Classifier.scoreLogistic(feat, Classifier.LogisticModel(Array(1L, 2L)),
        Seq("x0")))
  }
}
