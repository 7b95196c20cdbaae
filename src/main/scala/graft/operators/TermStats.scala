package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus term statistics: document frequencies and TF-IDF-ranked
  * characteristic terms per document — the classic keyword/topic signal
  * for corpus exploration and quality filtering.
  *
  * The score is INTEGER-VALUED by construction:
  * `tf * ((n_docs * 1e6) DIV df)` — the inverse-document-frequency
  * factor is a scaled BIGINT integer division, monotone in n_docs/df
  * exactly like log(N/df) for ranking purposes, but bit-identical on
  * every engine (no transcendental, no IEEE division), so the driver
  * oracle value-checks ranks AND scores. Scale shape: explode →
  * groupBy(doc, word) with map-side combine, one groupBy(word) for df
  * (a small frame — vocabulary-sized), broadcast of the 1-row corpus
  * count, and a per-doc window truncated to k.
  */
object TermStats {

  /** Document frequency per token (≥ `minTokenLen` chars, lowercased). */
  def docFrequencies(docs: DataFrame, idCol: String, textCol: String,
      minTokenLen: Int = 3): DataFrame =
    termFrequencies(docs, idCol, textCol, minTokenLen)
      .groupBy("word").agg(count(lit(1)).as("df"))

  /** Term frequency per (doc, token). */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String,
      minTokenLen: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .filter(length(col("word")) >= minTokenLen)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))

  /** Top-`k` characteristic terms per document by the integer TF-IDF
    * score; ties break toward the lexicographically smaller word so the
    * result is total-ordered and oracle-checkable.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minTokenLen: Int = 3): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol, minTokenLen)
    // df derives from the tf frame already in the plan — one row per
    // (doc, word) — NOT from a second tokenize-explode pass over the
    // corpus (docFrequencies from scratch would plan the explode twice)
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(total))
      .withColumn("score", expr("tf * ((n_docs * 1000000) DIV df)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("word"), col("score"))
  }
}
