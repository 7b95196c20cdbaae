package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import spark.implicits._

  // The Sennrich et al. (2016) worked corpus: low×5 lower×2 newest×6
  // widest×3. Hand-computed merge sequence under (count DESC, pair
  // ASC) tie-breaking:
  //   round 1: (e,s)=9 ties (s,t)=9 → (e,s); 9 occurrences merged
  //   round 2: (es,t)=9
  //   round 3: (l,o)=7 ties (o,w)=7 → (l,o)
  // Initial symbol total 79 (= 15+10+36+18) → 70 → 61 → 54.
  private def sennrichWords =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "wcount")

  test("merge sequence and symbol totals match the hand computation") {
    val rules = Bpe.train(sennrichWords, nMerges = 3)
    assert(rules.map(r => (r.merge_rank, r.left_sym, r.right_sym,
      r.pair_count, r.symbol_total)) === Seq(
      (1L, "e", "s", 9L, 70L),
      (2L, "es", "t", 9L, 61L),
      (3L, "l", "o", 7L, 54L)))
  }

  test("merge application is greedy left-to-right, non-overlapping") {
    // rule (a, a): "aaa" → [aa, a], never [a, aa]; "aaaa" → [aa, aa]
    val df = Seq("aaa", "aaaa").toDF("word")
      .select(col("word"),
        split(trim(Bpe.applyMerge(Bpe.initialSymbols(col("word")), "a", "a")), "  ")
          .as("syms"))
      .orderBy(length(col("word"))).collect()
    assert(df(0).getSeq[String](1) === Seq("aa", "a"))
    assert(df(1).getSeq[String](1) === Seq("aa", "aa"))
    // a merged symbol never re-pairs within the same rule pass, but a
    // LATER rule can consume it: (a,a) then (aa,a) retokenizes "aaa"
    val two = Seq("aaa").toDF("word")
      .select(split(trim(Bpe.applyMerges(Bpe.initialSymbols(col("word")),
        Seq(("a", "a"), ("aa", "a")))), "  ").as("syms")).collect()
    assert(two(0).getSeq[String](0) === Seq("aaa"))
  }

  test("whole-symbol matching: a rule for (a, b) cannot match inside xa/by") {
    val r = Seq("xaby").toDF("word")
      .select(split(trim(Bpe.applyMerge(Bpe.initialSymbols(col("word")), "a", "b")), "  ")
        .as("syms")).collect()
    assert(r(0).getSeq[String](0) === Seq("x", "ab", "y"))
    // after (x, a) produces symbol "xa", rule (a, b) must not fire on
    // its trailing "a" — matching is whole-symbol, not substring
    val keep = Seq("xab").toDF("word")
      .select(split(trim(Bpe.applyMerges(Bpe.initialSymbols(col("word")),
        Seq(("x", "a"), ("a", "b")))), "  ").as("syms")).collect()
    assert(keep(0).getSeq[String](0) === Seq("xa", "b"))
  }

  test("encode: learned vocabulary with exact weighted counts; mass conserved") {
    val rules = Bpe.train(sennrichWords, nMerges = 3)
    val enc = Bpe.encode(sennrichWords, rules.map(r => (r.left_sym, r.right_sym)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enc === Map("lo" -> 7L, "w" -> 16L, "e" -> 8L, "r" -> 2L,
      "n" -> 6L, "est" -> 9L, "i" -> 3L, "d" -> 3L))
    assert(enc.values.sum === rules.last.symbol_total)
  }

  test("wordCounts: whitespace tokenization, empty words dropped") {
    val docs = Seq((1L, "  a b  a "), (2L, ""), (3L, "b")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc === Map("a" -> 2L, "b" -> 2L))
  }

  test("training is partition-order independent") {
    val rules = Bpe.train(sennrichWords.repartition(7), nMerges = 3)
    assert(rules.map(r => (r.left_sym, r.right_sym, r.pair_count)) ===
      Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)))
  }

  test("early stop: a fully merged vocabulary ends the loop, loud require on bounds") {
    val rules = Bpe.train(Seq(("ab", 1L)).toDF("word", "wcount"), nMerges = 5)
    assert(rules.map(r => (r.left_sym, r.right_sym, r.pair_count, r.symbol_total)) ===
      Seq(("a", "b", 1L, 1L)))
    intercept[IllegalArgumentException] {
      Bpe.train(sennrichWords, nMerges = 0)
    }
  }
}
