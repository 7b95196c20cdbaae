package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("exact: identical texts group under one hash, min id kept") {
    val d = docs(1L -> "hello world", 2L -> "hello world", 3L -> "other")
    val out = Dedup.exact(d, "doc_id", "text").collect()
    assert(out.length === 2)
    val dup = out.find(_.getAs[Long]("n_copies") === 2L).get
    assert(dup.getAs[Long]("keep_id") === 1L)
  }

  test("jaccard: identical=1, disjoint=0") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "v w x y z")
      .withColumn("j_same", Dedup.jaccard(lit("a b c d e"), col("text"), 2))
    val m = d.select($"doc_id", $"j_same").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(2L) === 1.0)
    assert(m(3L) === 0.0)
  }

  test("minhash signatures: identical texts → identical signatures") {
    val d = docs(1L -> "the quick brown fox jumps", 2L -> "the quick brown fox jumps",
      3L -> "completely different words here now")
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text", 3, 16).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    assert(sigs(1L).length === 16)
  }

  test("shingle sets are sorted distinct and jaccardSorted matches set math") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f extra")
    val sets = Dedup.tokenShingleSets(d, "doc_id", "text", 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(sets(1L) === sets(1L).sorted)
    assert(sets(1L).distinct === sets(1L))
    assert(sets(1L).length === 5) // 6 tokens → 5 bigrams
    // jaccard of 5-shared / 6-union = 0.8333…
    val pairs = Dedup.nearDupPairs(d, "doc_id", "text", threshold = 0.5, shingleSize = 2)
      .collect()
    assert(pairs.length === 1)
    assert(math.abs(pairs.head.getAs[Double]("jaccard") - 5.0 / 6.0) < 1e-12)
  }

  test("nearDupPairs finds a planted near-duplicate and skips dissimilar docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(
      1L -> base,
      2L -> (base + " lambda"), // near-dup of 1
      3L -> "one two three four five six seven eight nine ten")
    val pairs = Dedup.nearDupPairs(d, "doc_id", "text", threshold = 0.5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.5)
  }

  test("ngramJaccardPairs (char level) finds the same planted pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(
      1L -> base,
      2L -> (base + " tail"),
      3L -> "one two three four five six seven eight nine ten")
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 6, threshold = 0.5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("simhash signatures agree between pipeline and per-row variants") {
    val d = docs(1L -> "the quick brown fox", 2L -> "pack my box with jugs")
    val pipeline = Dedup.simhashSignatures(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = d.select($"doc_id", Dedup.simhash($"text").as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pipeline === perRow)
  }

  test("simhashPairs: identical docs at hamming 0; unrelated docs absent") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "entirely unrelated content about databases and queries")
    val pairs = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getAs[Long]("hamming") === 0L)
  }

  test("fingerprints: winnowing selects a subset of k-gram hashes, deterministic") {
    val d = docs(1L -> "abcdefghijklmnopqrstuvwxyz", 2L -> "abcdefghijklmnopqrstuvwxyz")
    val fps = Dedup.fingerprints(d, "doc_id", "text", k = 8, w = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L).nonEmpty)
    // winnowing picks at most one hash per window → far fewer than all k-grams
    assert(fps(1L).length <= 26 - 8 + 1)
  }

  test("fingerprints: short text (< k chars) falls back to a single hash") {
    val fps = Dedup.fingerprints(docs(1L -> "tiny"), "doc_id", "text", k = 8, w = 4)
      .collect()
    assert(fps.head.getSeq[Long](1).isEmpty) // no 8-gram exists in 4 chars
  }
}
