package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — tokenizer induction
  * as a data-parallel loop (Sennrich et al. 2016; the shape every
  * published trainer, including the GPT-2 and HuggingFace ones, runs:
  * corpus → word frequencies once, then merges over the WORD TABLE).
  *
  * The scale split is the whole design:
  *  - The corpus is touched exactly once ([[wordCounts]] — a map-side
  *    combinable `groupBy(word)`), because BPE statistics are a
  *    function of the word-frequency table alone. At 100 TB the word
  *    table is ~10⁷ rows where the corpus is ~10¹³ tokens — six
  *    orders of magnitude of amplification that makes the merge loop
  *    cheap regardless of corpus size.
  *  - Each merge iteration runs on that vocabulary-sized frame: one
  *    adjacent-pair count (map-side combined) plus one `limit(1)`
  *    argmax — the ONLY driver-side value per iteration is the winning
  *    pair, and [[train]] bounds the loop with a loud `require`
  *    (driver state is O(nMerges), never O(vocab)). Lineage is
  *    truncated every `checkpointEvery` merges so iteration i never
  *    re-evaluates an unbounded replace chain.
  *
  * Symbol-sequence representation — the reason every step stays inside
  * whole-stage codegen on BOTH engines: a word's symbols are kept as a
  * single string, each symbol wrapped in single spaces with DOUBLE
  * spaces between symbols (`"abc" → " a  b  c "`). Under that
  * invariant, applying merge (l, r) is a plain literal
  * `replace(sym, " l  r ", " lr ")`:
  *  - whole-symbol matching is structural (every symbol occurrence is
  *    space-delimited on both sides, so `"xa"` can never match a rule
  *    for `"a"`), and
  *  - consecutive occurrences self-heal: the match consumes one of the
  *    two separator spaces, leaving the neighbouring occurrence's
  *    boundary intact — so the scan-left-to-right / non-overlapping
  *    semantics of `replace` (identical in Spark's `StringReplace` and
  *    DuckDB's `replace`) IS the greedy BPE merge order: with rule
  *    (a, a), `"a a a" → "aa a"`, never `"a aa"`.
  * The invariant is preserved by the replacement (merged symbols keep
  * single-space boundaries and double-space separators), so merges
  * chain with no re-normalization. No UDF, no fold, no per-row loop —
  * a merge step is one codegen'd string replace.
  *
  * Determinism: the argmax tie-breaks on (count DESC, left ASC,
  * right ASC) over ASCII token text, which orders identically in Spark
  * and DuckDB — so the learned rules, and everything downstream of
  * them, hash bit-for-bit against the oracle (q191/q192 unroll the
  * same loop as chained SQL CTEs).
  *
  * Encoding ([[encode]]) reuses the amplification: apply the learned
  * replace chain to the word TABLE and weight the exploded symbols by
  * word count — the corpus is never re-scanned. A streaming or
  * serving path applies the same `applyMerges` column to raw words.
  */
object Bpe {

  /** One learned merge: `rank` is 1-based order, `pair_count` the
    * weighted adjacent-pair frequency that won the argmax, and
    * `symbol_total` the corpus-wide weighted symbol count AFTER
    * applying the rule — a strictly decreasing sequence that pins the
    * replace semantics end-to-end (each merge removes exactly one
    * symbol per merged occurrence).
    */
  final case class MergeRule(
      merge_rank: Long, left_sym: String, right_sym: String,
      pair_count: Long, symbol_total: Long)

  /** Corpus pass: whitespace words with weighted counts. Empty
    * documents tokenize to the single empty token (the catalog's
    * `split(trim(text), "\\s+")` convention); empty words carry no
    * pair statistics and are dropped here.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("wcount"))

  /** `"abc" → " a  b  c "` — the wrapped symbol string (see object
    * doc). Built from two codegen'd string ops: spread every char to
    * `"c  "`, pad a leading space, drop the last of the two trailing
    * spaces.
    */
  def initialSymbols(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val padded = concat(lit(" "), regexp_replace(word, "(.)", "$1  "))
    padded.substr(lit(1), length(padded) - 1)
  }

  /** Apply one merge rule to a wrapped symbol string. */
  def applyMerge(sym: org.apache.spark.sql.Column, left: String, right: String): org.apache.spark.sql.Column =
    replace(sym, lit(" " + left + "  " + right + " "), lit(" " + left + right + " "))

  /** Chain a learned rule list (rank order) over a wrapped symbol
    * string — one codegen'd replace per rule.
    */
  def applyMerges(sym: org.apache.spark.sql.Column, rules: Seq[(String, String)]): org.apache.spark.sql.Column =
    rules.foldLeft(sym) { case (c, (l, r)) => applyMerge(c, l, r) }

  private def symbolArray(sym: org.apache.spark.sql.Column) =
    split(trim(sym), "  ")

  private val pairsExpr =
    "CASE WHEN size(__a) >= 2 THEN transform(sequence(0, size(__a) - 2), " +
      "i -> struct(__a[i] AS l, __a[i+1] AS r)) " +
      "ELSE CAST(array() AS array<struct<l: string, r: string>>) END"

  /** Learn `nMerges` merge rules from a `(word, wcount)` frame.
    *
    * Per iteration: adjacent-pair weighted count over the (replace-
    * chained) word table → `limit(1)` argmax to the driver → the rule
    * is folded into the symbol column; the weighted symbol total after
    * the fold is the rule's audit value. Stops early when no pair
    * remains (fully merged vocabulary). Driver memory is O(nMerges);
    * the word table never leaves the cluster.
    *
    * Real trainers run nMerges in the tens of thousands; each
    * iteration here is two vocabulary-sized jobs, so the loop is
    * minutes at 10⁷ words but `require`-bounded to keep a mis-called
    * nMerges from scheduling an unbounded job chain. `minCount`
    * prunes the word-frequency tail before the loop (the published
    * trainers' min_frequency), shrinking every iteration's input
    * without touching the corpus pass.
    */
  def train(words: DataFrame, nMerges: Int, minCount: Long = 1L,
      checkpointEvery: Int = 16): Seq[MergeRule] = {
    require(nMerges >= 1 && nMerges <= 65536,
      s"nMerges=$nMerges out of [1, 65536] — tokenizer vocabularies are " +
        "tens of thousands of merges; a larger ask is a mis-call")
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery")
    // materialize the vocabulary-sized symbol table ONCE so the loop's
    // per-iteration jobs read local blocks instead of re-running the
    // upstream corpus pass every iteration (the LanguageModel lesson:
    // checkpoint exactly when the recount being avoided is the corpus
    // scan itself)
    var w = words.filter(col("wcount") >= minCount)
      .select(initialSymbols(col("word")).as("sym"), col("wcount"))
      .localCheckpoint()
    val rules = Seq.newBuilder[MergeRule]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val top = w.select(symbolArray(col("sym")).as("__a"), col("wcount"))
        .select(explode(expr(pairsExpr)).as("__p"), col("wcount"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("wcount")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        w = w.withColumn("sym", applyMerge(col("sym"), l, r))
        if ((i + 1) % checkpointEvery == 0) w = w.localCheckpoint()
        val symTotal = w
          .agg(sum(col("wcount") * size(symbolArray(col("sym")))).as("t"))
          .collect()(0).getLong(0)
        rules += MergeRule(i + 1L, l, r, cnt, symTotal)
        i += 1
      }
    }
    rules.result()
  }

  /** The learned rules as a frame (the catalog/oracle surface). */
  def trainDf(spark: SparkSession, words: DataFrame, nMerges: Int,
      minCount: Long = 1L): DataFrame = {
    import spark.implicits._
    train(words, nMerges, minCount).toDF()
      .select(col("merge_rank"), col("left_sym"), col("right_sym"),
        col("pair_count"), col("symbol_total"))
  }

  /** Tokenize the corpus under a learned rule list: apply the replace
    * chain to the word TABLE, explode the final symbols, weight by
    * word count — `(token, tcount)`. The corpus itself is not
    * re-scanned (word-table amplification; see object doc).
    */
  def encode(words: DataFrame, rules: Seq[(String, String)]): DataFrame =
    words
      .select(applyMerges(initialSymbols(col("word")), rules).as("sym"),
        col("wcount"))
      .select(explode(symbolArray(col("sym"))).as("token"), col("wcount"))
      .groupBy(col("token")).agg(sum(col("wcount")).as("tcount"))
}
