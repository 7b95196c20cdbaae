package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** Trained document-quality classifier — the screen that follows the
  * heuristic filters in real pretraining pipelines (the fastText-style
  * "looks like the reference corpus" classifier of GPT-3/LLaMA data
  * work, Brown et al. 2020 §A; Touvron et al. 2023): learn weights
  * from a labeled slice, score every document, keep what clears the
  * threshold.
  *
  * Everything is FIXED-POINT integer arithmetic so training and
  * scoring are oracle-hashable and cluster-deterministic:
  *  - features are ppm-scale BIGINTs ([[docFeatures]]),
  *  - the link is the hard sigmoid σ(z) = clamp(½ + z/4, 0, 1) —
  *    piecewise-linear, so it needs no transcendental libm calls whose
  *    last-ulp behavior differs across engines,
  *  - weights live in integer micro-units and every division of the
  *    signed terms TRUNCATES toward zero on both engines ([[tdiv]] —
  *    the semantics Spark's `div` and DuckDB's `//` already share;
  *    measured, not assumed: DuckDB `(-7) // 2 = -3`),
  *  - gradient sums accumulate err·x products in DECIMAL(38,0)
  *    (integer addition commutes, so partition order can't change the
  *    result; BIGINT would overflow past ~10⁷ rows at ppm scale).
  *
  * Scale shape: one pass per gradient-descent iteration, each a single
  * map-side-combinable aggregation over the narrow feature frame; the
  * only driver-side state is the d-element weight vector (the k-means
  * sample posture). Iteration count is fixed and small (the screen
  * needs a separating direction, not a converged optimum — scores are
  * thresholded, not calibrated). For corpora where K extra text scans
  * hurt, persist [[docFeatures]]' narrow output once and train from
  * the artifact.
  */
object Classifier {

  /** Weights in integer micro-units (value ×10⁻⁶), index-aligned with
    * the `featureCols` they were trained on (bias first by convention).
    */
  final case class LogisticModel(weights: Array[Long])

  /** Integer division truncating toward zero for possibly-negative `a`
    * (b > 0) — the semantics Spark's `div`, DuckDB's `//`, and BigInt
    * `/` all share, so one convention covers engine, oracle, and the
    * driver-side update. `a % b` carries the dividend's sign, so the
    * subtraction makes the numerator exactly divisible and the double
    * division is exact (magnitudes stay far below 2⁵³).
    */
  private def tdiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("long")

  /** ppm-scale integer features for document-quality classification,
    * plus any `keep` columns passed through (e.g. a label):
    *  - x0 — bias (constant 10⁶),
    *  - x1 — English-stopword token share (multiset count ·10⁶ / token
    *    count; the fastText classifier's strongest cheap signal),
    *  - x2 — alphabetic character share,
    *  - x3 — length, capped at 2000 chars and rescaled to [0, 10⁶].
    * All divisions are [[tdiv]] (non-negative here, but one convention
    * everywhere keeps the oracle mirror mechanical).
    */
  def docFeatures(docs: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    val text = col(textCol)
    val ntok = greatest(TextFunctions.tokenCount(text).cast("long"), lit(1L))
    val len1 = greatest(length(text).cast("long"), lit(1L))
    docs.select(
      (col(idCol) +: keep.map(col)) ++ Seq(
        lit(1000000L).as("x0"),
        tdiv(TextFunctions.stopwordTokenCount(text, "en") * lit(1000000L), ntok)
          .as("x1"),
        tdiv(TextFunctions.alphaChars(text) * lit(1000000L), len1).as("x2"),
        (least(length(text).cast("long"), lit(2000L)) * lit(500L)).as("x3")): _*)
  }

  /** Signed prediction error in ppm under `weights`:
    * σ_ppm(z) − y·10⁶, with z = trunc(Σ wⱼ·xⱼ / 10⁶) micro-units and
    * σ_ppm = clamp(500000 + trunc(z/4), 0, 10⁶). */
  private def errPpm(weights: Array[Long], featureCols: Seq[String],
      label: Column): Column = {
    val zRaw = featureCols.zip(weights)
      .map { case (c, wj) => col(c) * lit(wj) }.reduce(_ + _)
    val z = tdiv(zRaw, lit(1000000L))
    val s = greatest(lit(0L),
      least(lit(1000000L), lit(500000L) + tdiv(z, lit(4L))))
    s - label * lit(1000000L)
  }

  /** Batch gradient descent from zero weights, `iters` fixed passes:
    * wⱼ ← wⱼ − trunc(lrNum·Σᵢ errᵢ·xᵢⱼ / (n·10⁶·lrDen)). Each pass is
    * one aggregation; the collected row is d DECIMAL scalars (bounded
    * driver state). Deterministic end to end: integer sums are
    * order-independent and the update is exact BigInt arithmetic
    * (BigInt `/` truncates — the [[tdiv]] convention).
    */
  def trainLogistic(feat: DataFrame, featureCols: Seq[String],
      labelCol: String, iters: Int, lrNum: Long = 4L,
      lrDen: Long = 1L): LogisticModel = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lrNum >= 1 && lrDen >= 1, s"learning rate must be positive")
    val n = feat.count()
    require(n > 0, "trainLogistic: empty training frame")
    var w = Array.fill(featureCols.length)(0L)
    for (_ <- 1 to iters) {
      val err = errPpm(w, featureCols, col(labelCol))
      val aggs = featureCols.map(c =>
        sum((err * col(c)).cast(DecimalType(38, 0))).as(s"__g_$c"))
      val row = feat.agg(aggs.head, aggs.tail: _*).head()
      w = w.indices.map { j =>
        val g = BigInt(row.getDecimal(j).toBigInteger)
        val denom = BigInt(n) * BigInt(1000000L) * BigInt(lrDen)
        w(j) - (g * BigInt(lrNum) / denom).toLong
      }.toArray
    }
    LogisticModel(w)
  }

  /** Score under a trained model: every input column passes through,
    * plus `score_ppm` (the hard-sigmoid output in ppm) and `predicted`
    * (1 when score_ppm ≥ 500000). One narrow projection — no shuffle.
    */
  def scoreLogistic(feat: DataFrame, model: LogisticModel,
      featureCols: Seq[String]): DataFrame = {
    require(model.weights.length == featureCols.length,
      s"model has ${model.weights.length} weights for ${featureCols.length} features")
    val zRaw = featureCols.zip(model.weights)
      .map { case (c, wj) => col(c) * lit(wj) }.reduce(_ + _)
    val z = tdiv(zRaw, lit(1000000L))
    val s = greatest(lit(0L),
      least(lit(1000000L), lit(500000L) + tdiv(z, lit(4L))))
    feat.withColumn("score_ppm", s)
      .withColumn("predicted",
        when(col("score_ppm") >= 500000L, 1L).otherwise(0L))
  }
}
