package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet/KenLM
  * quality filter re-expressed Spark-first. Real pretraining pipelines
  * score every document against an LM trained on a trusted slice and
  * drop the worst tail; this is that loop with the model itself being
  * two count tables the engine builds, so there is no external
  * artifact and no native library.
  *
  * Model = add-one-smoothed bigram LM over whitespace tokens:
  * p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V), with V the distinct
  * token count of the training slice. The model is DATA, not driver
  * state: `bigramCounts` / `prefixCounts` are plain frames keyed by
  * token strings, so scoring is two hash equi-joins that shuffle the
  * exploded corpus by (bigram) then (w1) — the standard token-join
  * shape that scales to billions of distinct n-grams where a broadcast
  * model cannot. Only the scalar V crosses the driver. Hot prefixes
  * ("the", "") are the skew case: the count aggregations are map-side
  * combinable so the shuffle carries (token, partial-count) pairs, and
  * the scoring join is AQE-skew-splittable because the model side of a
  * hot key is ONE row.
  *
  * Two scoring forms, one semantics:
  *  - [[scoreFluencyPpm]] — exact-integer proxy (mean per-bigram
  *    conditional probability in ppm, each term floor-divided before
  *    the sum, the sum floor-divided by the bigram count). Every value
  *    is a BIGINT any SQL engine reproduces bit-for-bit, so the
  *    catalog can hash-check it (q184).
  *  - [[crossEntropyBits]] — the true −mean log₂ p(w2|w1) in IEEE
  *    doubles, the number CCNet actually thresholds. Log evaluation is
  *    libm-dependent across engines, so this form is spec-grounded
  *    (hand-computed example + ordering invariants) rather than
  *    oracle-hashed; the two forms rank documents identically in the
  *    high-probability regime because both are monotone in the same
  *    per-bigram conditionals.
  *
  * Pruning: `minCount` drops bigrams seen fewer times from the model
  * (CCNet prunes its KenLM the same way) — scoring then treats them as
  * unseen (smoothed floor). Default 1 keeps the model exact for the
  * oracle. At 100 TB, minCount ≈ 2–5 typically shrinks the bigram
  * table ~5–10× (singleton n-grams dominate) at negligible score
  * drift.
  *
  * Tokenization matches the catalog's text family: `split(trim(text),
  * "\\s+")` — an empty document yields the single empty token, which
  * both Spark and DuckDB's `regexp_split_to_array` produce, so the
  * convention is cross-engine stable (see q133's oracle).
  */
object LanguageModel {

  /** The trained model: two count frames + the vocabulary scalar.
    * `vocabSize` is materialized at train time (one distinct-count
    * action — the only driver-side value in the loop).
    */
  final case class BigramLm(
      bigramCounts: DataFrame, // (bigram, c_bigram)
      prefixCounts: DataFrame, // (w1, c_prefix)
      vocabSize: Long)

  private def tokensCol = split(trim(col("__text")), "\\s+")

  /** (id, w1, bigram) — one row per adjacent token pair. Documents
    * with fewer than two tokens contribute no rows (guarded empty
    * array, not a null explode). */
  private def explodedBigrams(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val pairs = when(size(col("__ws")) >= 2,
      expr("transform(sequence(0, size(__ws) - 2), " +
        "i -> struct(__ws[i] AS w1, concat(__ws[i], ' ', __ws[i+1]) AS bigram))"))
      .otherwise(expr("CAST(array() AS array<struct<w1: string, bigram: string>>)"))
    docs.select(col(idCol), col(textCol).as("__text"))
      .withColumn("__ws", tokensCol)
      .select(col(idCol), explode(pairs).as("__p"))
      .select(col(idCol), col("__p.w1").as("w1"), col("__p.bigram").as("bigram"))
  }

  /** Train the bigram LM on `docs`. Two count aggregations (shuffle
    * keyed by bigram / by w1, both map-side combined) plus one
    * distinct-count action for V — three single-column corpus scans
    * per training run, deliberately left lazy and fused: an in-query
    * checkpoint of the shared explode measured SLOWER at every gated
    * and sweep scale (the vocabulary-sized table costs less to
    * recount than to round-trip), and the scan count only matters
    * when training repeats — which the artifact pattern removes:
    * train once, [[save]] once, and score every corpus/stream from
    * [[load]], whose model tables are parquet reads with no training
    * lineage at all. `minCount` > 1 prunes rare bigrams from the
    * model (prefix counts and V stay unpruned — the smoothing
    * denominator must not shrink when the numerator table does, or
    * pruned scores would exceed unpruned ones). */
  def train(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 1L): BigramLm = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val b = explodedBigrams(docs, idCol, textCol)
    val cb = b.groupBy(col("bigram")).agg(count(lit(1)).as("c_bigram"))
      .filter(col("c_bigram") >= minCount)
    val cp = b.groupBy(col("w1")).agg(count(lit(1)).as("c_prefix"))
    val v = docs.select(col(textCol).as("__text"))
      .select(explode(tokensCol).as("__w"))
      .agg(countDistinct(col("__w"))).head.getLong(0)
    require(v > 0, "training corpus is empty — the smoothing denominator needs V >= 1")
    BigramLm(cb, cp, v)
  }

  /** Exact-integer fluency score per document:
    * `fluency_ppm = (Σ over bigrams ⌊(c(w1w2)+1)·10⁶ / (c(w1)+V)⌋) DIV
    * n_bigrams`, plus the bigram and out-of-vocabulary counts. Higher
    * = more probable under the model; repetitive or shuffled-token
    * text scores low because its transitions are unseen (the smoothed
    * floor ≈ 10⁶/V ppm each). Documents with no bigrams score 0 with
    * n_bigrams = 0 — a screen downstream should treat them as a
    * separate (too-short) class, not as disfluent. */
  def scoreFluencyPpm(docs: DataFrame, lm: BigramLm, idCol: String,
      textCol: String): DataFrame = {
    val b = explodedBigrams(docs, idCol, textCol)
    val contrib = expr(
      s"(coalesce(c_bigram, 0L) + 1L) * 1000000L DIV (coalesce(c_prefix, 0L) + ${lm.vocabSize}L)")
    val perDoc = b
      .join(lm.bigramCounts, Seq("bigram"), "left")
      .join(lm.prefixCounts, Seq("w1"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("c_bigram").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(contrib).as("__ppm_sum"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_bigrams", "n_oov"))
      .withColumn("fluency_ppm",
        when(col("n_bigrams") === 0L, 0L)
          .otherwise(expr("CAST(__ppm_sum DIV n_bigrams AS BIGINT)")))
      .drop("__ppm_sum")
  }

  /** Persist a trained model as the deployable artifact (the CCNet
    * shape: the LM ships to the scoring cluster as files, not as a
    * training-job closure): two count tables + a 1-row meta table.
    * Parquet with overwrite — retraining replaces the artifact
    * atomically enough for a batch cadence; version under dated paths
    * if readers race retrains.
    */
  def save(lm: BigramLm, path: String): Unit = {
    val spark = lm.bigramCounts.sparkSession
    import spark.implicits._
    lm.bigramCounts.write.mode("overwrite").parquet(s"$path/bigram_counts")
    lm.prefixCounts.write.mode("overwrite").parquet(s"$path/prefix_counts")
    Seq(lm.vocabSize).toDF("vocab_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a persisted model. Scoring against a loaded model is
    * bit-identical to scoring against the in-memory one (spec-pinned):
    * the model was already plain data, so the round-trip changes
    * nothing but provenance.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): BigramLm =
    BigramLm(
      spark.read.parquet(s"$path/bigram_counts"),
      spark.read.parquet(s"$path/prefix_counts"),
      spark.read.parquet(s"$path/meta").head.getLong(0))

  /** True cross-entropy in bits per bigram: −(1/n)·Σ log₂ p(w2|w1),
    * the number an LM-perplexity filter thresholds (perplexity =
    * 2^xent). IEEE doubles — spec-grounded, not oracle-hashed (see
    * object doc). Zero-bigram documents get NULL (no defined
    * entropy), distinguishing them from genuinely low-entropy text. */
  def crossEntropyBits(docs: DataFrame, lm: BigramLm, idCol: String,
      textCol: String): DataFrame = {
    val b = explodedBigrams(docs, idCol, textCol)
    val logP = log2(
      (coalesce(col("c_bigram"), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col("c_prefix"), lit(0L)) + lit(lm.vocabSize)).cast("double"))
    val perDoc = b
      .join(lm.bigramCounts, Seq("bigram"), "left")
      .join(lm.prefixCounts, Seq("w1"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), (-avg(logP)).as("xent_bits"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_bigrams"))
  }
}
