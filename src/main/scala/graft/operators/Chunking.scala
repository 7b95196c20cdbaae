package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Document segmentation and benchmark decontamination — the two
  * pre-training steps between curation and tokenization.
  *
  * Chunking splits long documents into bounded, optionally overlapping
  * windows (context-length packing, embedding-model input limits).
  * Pure column arithmetic + one explode: no shuffle, no UDF, and the
  * chunk count per document is `ceil(len / stride)` so output size is
  * linear in corpus size.
  *
  * Decontamination flags corpus documents that CONTAIN any n-gram of a
  * benchmark/eval set (the standard 13-gram contamination rule). The
  * benchmark side is tiny relative to the corpus, so its distinct
  * n-gram hashes build once and the corpus side is one semi-join on
  * the exploded hash — shuffle carries (doc_id, hash) longs, never
  * text; with a small benchmark Catalyst broadcasts the hash set and
  * the whole check is map-side.
  */
object Chunking {

  /** Character-window chunks: windows of `maxLen` chars starting every
    * `maxLen - overlap` chars. Returns (doc_id, chunk_id, chunk_text)
    * with chunk_id 0-based in document order; empty docs yield no
    * chunks. The last window may be shorter than `maxLen`. A chunk is
    * emitted only while it contributes text beyond the previous
    * chunk's overlap (start < len − overlap): a tail ≤ `overlap` chars
    * is already fully inside the previous window, and emitting it
    * would duplicate training content. Coverage stays complete — the
    * last emitted start is ≥ len − maxLen, so every character appears
    * in some chunk.
    */
  def chunkByChars(
      docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int, overlap: Int = 0): DataFrame = {
    require(maxLen > 0 && overlap >= 0 && overlap < maxLen,
      s"need 0 <= overlap < maxLen, got maxLen=$maxLen overlap=$overlap")
    val stride = maxLen - overlap
    val len = length(col(textCol))
    val newContent = greatest(len - overlap, lit(1))
    val nChunks = when(len <= 0, lit(0))
      .otherwise(floor((newContent - 1).cast("double") / stride).cast("int") + 1)
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"), nChunks.as("__n"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(0), col("__n") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        col("__t").substr(col("chunk_id") * stride + 1, lit(maxLen)).as("chunk_text"))
  }

  /** Token-window chunks (whitespace tokens, `maxTokens` per chunk,
    * `overlap` tokens shared between neighbors): the shape tokenizer-
    * bounded models need. Same linear explode; chunk text is the
    * space-rejoin of the token slice.
    */
  def chunkByTokens(
      docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got maxTokens=$maxTokens overlap=$overlap")
    val stride = maxTokens - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    val nTok = when(length(trim(col(textCol))) === 0, lit(0)).otherwise(size(toks))
    // same emit rule as chunkByChars: no purely-overlap tail chunks
    val newContent = greatest(nTok - overlap, lit(1))
    val nChunks = when(nTok <= 0, lit(0))
      .otherwise(floor((newContent - 1).cast("double") / stride).cast("int") + 1)
    docs.select(col(idCol).as("doc_id"), toks.as("__toks"), nChunks.as("__n"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), col("__n") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxTokens)))
          .as("chunk_text"),
        least(size(col("__toks")) - col("chunk_id") * stride, lit(maxTokens))
          .as("n_tokens"))
  }

  /** Benchmark decontamination: corpus docs containing ANY token
    * n-gram of the benchmark set, with the count of distinct matching
    * n-grams. Hashing runs through the compiled shingle-set kernel
    * (one pass per document); only (id, hash) longs reach the join.
    */
  def flagContaminated(
      corpus: DataFrame, benchmarks: DataFrame,
      idCol: String, textCol: String,
      benchTextCol: String = "text", n: Int = 13): DataFrame = {
    val benchGrams = benchmarks
      .select(explode(GraftFunctions.shingleSet(col(benchTextCol), n, charLevel = false)).as("gh"))
      .distinct()
    val corpusGrams = corpus.select(col(idCol).as("doc_id"),
      explode(GraftFunctions.shingleSet(col(textCol), n, charLevel = false)).as("gh"))
    corpusGrams.join(benchGrams, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_matching_ngrams"))
  }

  /** LM-pretraining sequence packing: documents are (conceptually)
    * concatenated in (group, id) order and the token stream is split
    * at `budget`-token boundaries. Emits each document's coordinates
    * in that stream — `pack_id` (which training sequence its first
    * token lands in) and `pack_offset` (where inside it) — from ONE
    * running-sum window per group: integers only, no shuffle beyond
    * the group partition, and SQL-expressible for the oracle. A doc
    * longer than the remaining budget simply spans into the next
    * pack(s), exactly like concat-and-split tokenization does.
    * Scale: the window shuffles on `groupCol` — pack within natural
    * shards (source / date bucket), never one global stream, so no
    * single partition sees the whole corpus.
    */
  def packSequences(
      docs: DataFrame, idCol: String, tokenCol: String, groupCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"packSequences: budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // a null token count packs as 0 tokens (sum() would skip it in the
    // running stream anyway — coalescing keeps the row's OWN
    // coordinates defined instead of null)
    val toks = coalesce(col(tokenCol), lit(0L))
    val before = (sum(toks).over(w) - toks).as("__before")
    docs.select(col(idCol), col(groupCol), col(tokenCol), before)
      .select(col(idCol), col(groupCol), col(tokenCol),
        expr(s"__before DIV $budget").as("pack_id"),
        expr(s"__before % $budget").as("pack_offset"))
  }

  /** SFT example formatting with loss-mask boundaries — the data-prep
    * step between a curated corpus and a fine-tuning run: each doc is
    * rendered into a single training string
    * `<|user|>{instruction}{prompt_body} <|assistant|> {completion}`
    * and the trainer needs to know WHERE the completion starts so
    * prompt tokens are masked out of the loss. `mask_from` counts the
    * whitespace tokens of the prompt REGION (user tag + instruction +
    * body + assistant tag); swap the token counter for a real BPE at
    * the same column position. Pure per-row column arithmetic — no
    * UDF, no shuffle.
    *
    * Mask alignment is an INVARIANT of the template, not an
    * approximation: whitespace around `<|assistant|>` guarantees the
    * prompt's last token (even a mid-word cut) can never merge with
    * the completion's first, so
    * `tokens(rendered) = mask_from + n_completion_tokens` always — a
    * trainer masking the first `mask_from` tokens of `rendered` masks
    * exactly the prompt region (spec-gated, including mid-word cuts).
    *
    * Docs shorter than `promptChars` get an empty completion (mask
    * covers everything — the trainer drops them, flagged via
    * `n_completion_tokens = 0`).
    */
  def sftFormat(
      docs: DataFrame, idCol: String, textCol: String,
      instruction: String, promptChars: Int): DataFrame = {
    require(promptChars > 0, s"promptChars must be positive, got $promptChars")
    def nTokens(c: org.apache.spark.sql.Column) =
      when(length(trim(c)) === 0, 0L)
        .otherwise(size(split(trim(c), "\\s+")).cast("long"))
    val promptBody = substring(col(textCol), 1, promptChars)
    val completion = substring(col(textCol), promptChars + 1, Int.MaxValue)
    val promptRegion = concat(lit("<|user|>"), lit(instruction), promptBody,
      lit(" <|assistant|>"))
    val rendered = concat(promptRegion, lit(" "), completion)
    docs.select(
      col(idCol).as("doc_id"),
      rendered.as("rendered"),
      length(rendered).cast("long").as("n_chars"),
      nTokens(promptRegion).as("n_prompt_tokens"),
      nTokens(completion).as("n_completion_tokens"))
      .withColumn("mask_from", col("n_prompt_tokens"))
  }
}
