package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication at training-pipeline scale: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every stage is DataFrame → DataFrame. Candidate
  * generation is a self-equi-join on (band, bandHash) — i.e. a shuffle
  * on the LSH bucket key, never an all-pairs cross join. At 100 TB the
  * bucket join is the only quadratic-risk step and it is bounded by
  * bucket size (tune bands/rows to keep buckets small); everything else
  * is linear scans with map-side computation.
  */
object Dedup {

  /** Exact dedup: group identical texts by md5, keep the smallest id.
    * (md5 over the raw bytes; 128-bit collisions are not a practical
    * concern for dedup.)
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: k independent hash functions simulated as
    * xxhash64 over (i, shingle); signature_i = min over shingles.
    * Computed per-row from the shingle array — no explode, no shuffle.
    */
  def minhashSignature(text: Column, k: Int, shingleSize: Int): Column = {
    val shingles = TextFunctions.tokenShingles(text, shingleSize)
    array((0 until k).map { i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))
    }: _*)
  }

  /** LSH banding: split the k-long signature into `bands` groups of
    * k/bands and hash each; docs sharing any (band, hash) are
    * candidates.
    */
  def lshCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleSize: Int = 3): DataFrame = {
    val r = k / bands
    val withSig = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("sig", minhashSignature(col("text"), k, shingleSize))
    val banded = withSig.select(
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

  /** Exact Jaccard similarity between the token-shingle SETS of two
    * text columns.
    */
  def jaccard(a: Column, b: Column, shingleSize: Int): Column = {
    val sa = array_distinct(TextFunctions.tokenShingles(a, shingleSize))
    val sb = array_distinct(TextFunctions.tokenShingles(b, shingleSize))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(sa) + size(sb) - size(array_intersect(sa, sb))
    when(union === 0, lit(1.0)).otherwise(inter / union)
  }

  /** Full near-dup pipeline: MinHash LSH candidates → exact n-gram
    * Jaccard verification ≥ threshold. Returns (doc_a, doc_b, jaccard).
    */
  def nearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 16, bands: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val cands = lshCandidates(docs, idCol, textCol, k, bands, shingleSize)
    cands
      .join(base.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "text_a"), Seq("doc_a"))
      .join(base.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "text_b"), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("text_a"), col("text_b"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: bit j of the result is the
    * sign of Σ_tokens (±1 depending on bit j of xxhash64(token)).
    * Pure per-row array math — no explode.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup candidates: docs whose simhash matches on any of
    * 4 16-bit bands (necessary condition for Hamming distance ≤ 3).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sh"))
    val banded = sigs.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(0xFFFF).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bh"))
    val hamming = {
      // popcount via bit_count (Spark 3.4+)
      bit_count(col("l.sh").bitwiseXOR(col("r.sh")))
    }
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        hamming.as("hamming"))
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
