package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.functions.TextFunctions

/** Document deduplication at training-pipeline scale: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design:
  *  - per-document work (shingling, hashing, signatures) is ONE
  *    compiled kernel call per row via the custom Catalyst expressions
  *    in [[graft.expressions]] — no interpreted higher-order functions,
  *    no explode, no signature shuffle;
  *  - candidate generation is always a self-equi-join on a bounded
  *    blocking key (LSH band hash / signature band / anchor hash),
  *    shuffled on that key — never an all-pairs cross join;
  *  - verification (exact Jaccard) runs only on candidate pairs and
  *    compares precomputed hash sets, so text is never re-shingled per
  *    pair.
  */
object Dedup {

  /** Exact dedup: group identical texts by md5, keep the smallest id.
    * (md5 over the raw bytes; 128-bit collisions are not a practical
    * concern for dedup.)
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-document SORTED distinct shingle-hash set: (doc_id, sh:
    * array<long>). One compiled kernel call per row
    * ([[graft.expressions.ShingleSet]]); sorted so exact-Jaccard
    * verification is a linear merge.
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, charLevel: Boolean): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      GraftFunctions.shingleSet(col(textCol), shingleSize, charLevel).as("sh"))

  def tokenShingleSets(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame =
    shingleSets(docs, idCol, textCol, shingleSize, charLevel = false)

  /** Per-document distinct character n-gram hash set. */
  def charShingleSets(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    shingleSets(docs, idCol, textCol, n, charLevel = true)

  /** MinHash signatures straight from text: one compiled kernel call
    * per row ([[graft.expressions.MinHashSig]]) — no explode, no
    * shuffle, no intermediate arrays. k permutations are derived from
    * one shingle hash (g_i(h) = mix64(h ^ seed_i)).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, k: Int, charLevel: Boolean = false): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      GraftFunctions.minhashSig(col(textCol), shingleSize, k, charLevel).as("sig"))

  /** LSH banding over a MinHash signature column: the k-long signature
    * splits into `bands` groups of k/bands, each hashed to a bucket key;
    * docs sharing any (band, bucket) are candidate pairs.
    */
  def bandPairs(sigs: DataFrame, bands: Int, k: Int): DataFrame = {
    val r = k / bands
    val banded = sigs.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * r + 1, r)).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash + LSH candidate pairs (no verification). */
  def lshCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleSize: Int = 3): DataFrame =
    bandPairs(minhashSignatures(docs, idCol, textCol, shingleSize, k), bands, k)

  /** Exact Jaccard ≥ threshold on precomputed sorted hash sets —
    * a linear merge per pair ([[graft.expressions.JaccardSorted]]).
    */
  private def verifyJaccard(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("jaccard", GraftFunctions.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Exact Jaccard similarity between the token-shingle SETS of two
    * text columns (ad-hoc pairwise use; the scalable pipelines verify
    * on precomputed sets instead).
    */
  def jaccard(a: Column, b: Column, shingleSize: Int): Column = {
    val sa = array_distinct(TextFunctions.tokenShingles(a, shingleSize))
    val sb = array_distinct(TextFunctions.tokenShingles(b, shingleSize))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(sa) + size(sb) - size(array_intersect(sa, sb))
    when(union === 0, lit(1.0)).otherwise(inter / union)
  }

  /** Full near-dup pipeline: MinHash LSH candidates → exact token
    * n-gram Jaccard verification ≥ threshold on precomputed sets.
    * Returns (doc_a, doc_b, jaccard).
    */
  def nearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 16, bands: Int = 4,
      shingleSize: Int = 3, charLevel: Boolean = false): DataFrame = {
    // set + signature in ONE projection: the signature derives from the
    // set column (MinHashFromSet), and codegen subexpression
    // elimination computes the ShingleSet child once — each branch
    // below tokenizes/hashes a document exactly once.
    val shExpr = GraftFunctions.shingleSet(col(textCol), shingleSize, charLevel)
    val prepared = docs.select(col(idCol).as("doc_id"), shExpr.as("sh"),
      GraftFunctions.minhashFromSet(shExpr, k).as("sig"))
    val cands = bandPairs(prepared.select(col("doc_id"), col("sig")), bands, k)
    val sets = prepared.select(col("doc_id"), col("sh"))
    val pairs = cands
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
    verifyJaccard(pairs, threshold)
  }

  /** Set-similarity join on character n-grams: MinHash signatures over
    * the char-shingle sets, LSH-banded candidates, exact Jaccard
    * verification. Char n-grams make the similarity robust to
    * tokenization differences (the token-level variant is
    * `nearDupPairs`). Banding keys on signature fragments, so bucket
    * collision probability tracks actual similarity (≈ 1-(1-j^r)^bands)
    * rather than global shingle frequency — a naive "anchor on the
    * smallest shingle hashes" scheme degenerates here because common
    * n-grams ("the ") put most of the corpus in one bucket.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.5,
      k: Int = 16, bands: Int = 4): DataFrame =
    nearDupPairs(docs, idCol, textCol, threshold, k, bands, n, charLevel = true)

  /** 64-bit SimHash signatures: bit j of the signature is the sign of
    * Σ_tokens (±1 by bit j of hash(token)) — one compiled kernel call
    * per row ([[graft.expressions.SimHash64]]), no explode, no shuffle.
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sh"))

  /** Per-row SimHash Column (same kernel as the pipeline). */
  def simhash(text: Column): Column = GraftFunctions.simhash64(text)

  /** SimHash near-dup candidates: docs whose signature matches on any of
    * 4 16-bit bands (necessary condition for Hamming distance ≤ 3),
    * filtered to Hamming ≤ maxHamming via bit_count.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs, idCol, textCol)
    val banded = sigs.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(0xFFFF).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bh"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    * k-gram hashes → min per sliding window of w → distinct selected
    * hashes. Returns (id, fingerprints: array<long>) — per-row compute.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val hashes = TextFunctions.charShingleHashes(col(textCol), k)
    val nWin = size(hashes) - (w - 1)
    val fps = when(nWin < 1,
        when(size(hashes) > 0, array(array_min(hashes))).otherwise(array().cast("array<bigint>")))
      .otherwise(array_distinct(transform(sequence(lit(1), nWin),
        i => array_min(slice(hashes, i, lit(w))))))
    docs.select(col(idCol).as("doc_id"), fps.as("fingerprints"))
  }
}
