package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained character-n-gram language identification — the classic
  * Cavnar & Trenkle (1994) rank-profile classifier, the method the
  * fastText-era lang-id tools descend from, as a pure data-parallel
  * pipeline with integer-exact scoring.
  *
  * [[graft.functions.TextFunctions]]' lang-id is a fixed HEURISTIC
  * (hand-picked marker n-grams); this is its TRAINED twin: per-
  * language profiles are induced from a labeled corpus slice, so new
  * languages/domains need no code change — the model is two small
  * frames.
  *
  * Model: per language, the top-`k` lowercased char trigrams ranked by
  * corpus frequency (ties broken by trigram text — deterministic).
  * Scoring: a document's own top-`docTopN` trigram ranking is compared
  * to each profile with the out-of-place distance
  * Σ |rank_doc − rank_profile| (missing trigram ⇒ penalty `k`);
  * prediction = argmin distance, ties to the smaller language code.
  * Every quantity is a BIGINT rank or sum, so the whole classifier is
  * engine-reproducible (oracle-hashable), unlike logit-based scorers.
  *
  * Scale shape:
  *  - trigram counting is one explode + map-side-combined
  *    `groupBy(id, tri)`; rows are (id, 3 chars, count) — narrow;
  *  - per-document top-N is a rank window partitioned BY DOCUMENT
  *    (parallel; Spark's WindowGroupLimit pushes the rank cut below
  *    the sort);
  *  - profiles are bounded BY CONSTRUCTION at `languages × k` rows —
  *    the one side this pipeline broadcasts, legitimately;
  *  - the scoring join fans each document's ≤ docTopN trigrams by the
  *    (small) language list and aggregates per (doc, lang): ≤
  *    docTopN·L rows per document, never corpus × corpus.
  */
object LangId {

  private def trigramsExpr(textCol: String) =
    s"CASE WHEN length(lower(trim(`$textCol`))) >= 3 THEN " +
      s"transform(sequence(1, length(lower(trim(`$textCol`))) - 2), " +
      s"i -> substring(lower(trim(`$textCol`)), i, 3)) " +
      "ELSE CAST(array() AS array<string>) END"

  /** (id, tri, c) — lowercased char-trigram counts per row. */
  def trigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"), explode(expr(trigramsExpr(textCol))).as("tri"))
      .groupBy(col("__id"), col("tri")).agg(count(lit(1)).as("c"))

  /** Per-language rank profiles from a LABELED corpus: top-`k`
    * trigrams by frequency, rank 1-based, ties to the smaller
    * trigram. Output (lang, tri, rank) — bounded at languages × k.
    */
  def trainProfiles(labeled: DataFrame, langCol: String, idCol: String,
      textCol: String, k: Int = 64): DataFrame = {
    require(k >= 1, s"profile size must be >= 1, got $k")
    val triCounts = labeled
      .select(col(langCol).as("lang"), explode(expr(trigramsExpr(textCol))).as("tri"))
      .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("c").desc, col("tri"))
    triCounts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("tri"), col("rank"))
  }

  /** Classify every document against the profiles: out-of-place
    * distance over the document's top-`docTopN` trigrams, missing ⇒
    * `k`. Returns (id, pred_lang, dist); documents too short for any
    * trigram predict 'und' with dist −1.
    */
  def classify(docs: DataFrame, profiles: DataFrame, idCol: String,
      textCol: String, docTopN: Int = 32, k: Int = 64): DataFrame = {
    require(docTopN >= 1, s"docTopN must be >= 1, got $docTopN")
    val dn = {
      val w = Window.partitionBy(col("__id")).orderBy(col("c").desc, col("tri"))
      trigramCounts(docs, idCol, textCol)
        .withColumn("rd", row_number().over(w).cast("long"))
        .filter(col("rd") <= docTopN)
    }
    val langs = profiles.select(col("lang")).distinct()
    val dist = dn.crossJoin(broadcast(langs))
      .join(broadcast(profiles).withColumnRenamed("rank", "rp"),
        Seq("lang", "tri"), "left")
      .groupBy(col("__id"), col("lang"))
      .agg(sum(when(col("rp").isNull, lit(k.toLong))
        .otherwise(abs(col("rd") - col("rp")))).as("dist"))
    val best = dist
      .groupBy(col("__id"))
      .agg(min(struct(col("dist"), col("lang"))).as("b"))
      .select(col("__id"), col("b.lang").as("pred_lang"), col("b.dist").as("dist"))
    docs.select(col(idCol).as("__id")).distinct()
      .join(best, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("dist"), lit(-1L)).as("dist"))
  }
}
