package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.operators.Similarity

/** A/B the exhaustive ADC scan's two corpus-streamed shapes PAST the
  * broadcast budget (VERDICT r14 #2's "one measured point past 4 M
  * codes"): the r15 blocked kernel (`Similarity.adcScanBlocked` —
  * LUT-major over L2-resident code blocks) against the r14 row-at-a-
  * time shape it replaced (codes stream through a nested-loop join
  * against broadcast LUTs — every one of the |pairs|·m lookups walks
  * the full LUT set, i.e. misses DRAM once the set outgrows the LLC).
  * Both arms read the SAME pre-materialized codes + LUT parquet, run
  * the same bounded top-k cut, and print the survivor-set size plus an
  * order-independent xxhash64-sum checksum of the exploded
  * (query_id, neighbor_id) survivors (ADVICE r15: a bare post-cut
  * group count is |Q| for both arms regardless of content — the
  * checksum makes result divergence between the shapes visible right
  * here, on top of the SimilaritySpec equivalence pin); only the scan
  * shape differs. The row-at-a-time arm exists ONLY here, as the
  * measured baseline — the library dispatches to the blocked kernel.
  *
  * The corpus is `copies` ScaleUp-organic key-shifted copies of the
  * sfDir embeddings (default 2 200 × sf0.1's 2 000 = 4.4 M codes =
  * 317 MB packed — just past the 288 MB budget), with every 1 100th
  * vector as a query (4 000 LUTs = 65 MB, past any LLC).
  *
  * Usage: runMain graft.tools.AdcScanBench <sfDir> [copies=2200] [qMod=1100]
  *   qMod sets |Q| = corpus/qMod: 1100 → 4 000 LUTs (62 MB — inside
  *   this box's 260 MB L3, where the shapes tie), 220 → 20 000 LUTs
  *   (310 MB — past the LLC, the regime the blocked kernel exists for).
  */
object AdcScanBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 2200
    val qMod = if (args.length > 2) args(2).toInt else 1100
    val dim = 64; val m = 8; val w = dim / m
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val span = ((e.agg(max(col("vec_id"))).head.getLong(0) / 1000L) + 1L) * 1000L
    val corpus = ScaleUp.organicEmbeddings(e, copies, span)
    val corpusC = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv2"))
    val queries = corpus.filter(col("vec_id") % qMod === 0)

    // materialize both scan inputs once so the arms time the SCAN, not
    // the encode (and read byte-identical inputs)
    val tmp = s"/tmp/adc_scan_bench_${copies}_$qMod"
    val codeRows = Similarity.pqCodeRows(corpusC, dim, m)
    corpusC.select(col("neighbor_id"),
        array(Similarity.pqBlocks(dim, m)
          .map(b => Similarity.signBucket(col("cv2"), b)): _*).as("codes"))
      // 64 files so the scan yields enough splits to feed every core —
      // a real lake table has thousands; a single 302 MB file gives 3
      .repartition(64)
      .write.mode("overwrite").parquet(s"$tmp/codes")
    Similarity.pqLuts(
        Similarity.pqQueryTable(queries, Similarity.pqCodebook(codeRows),
          dim, m, "vec_id", "embedding"), m, w)
      .write.mode("overwrite").parquet(s"$tmp/luts")
    val codes = spark.read.parquet(s"$tmp/codes")
    val luts = spark.read.parquet(s"$tmp/luts")
    val nCodes = codes.count(); val nQ = luts.count()
    println(s"ADC_BENCH corpus=$nCodes codes (${nCodes * 8L * (m + 1) / (1 << 20)} MB, " +
      s"budget ${Similarity.adcBroadcastBudgetBytes / (1 << 20)} MB), " +
      s"|Q|=$nQ (LUT set ${nQ * ((m << w) + 1) * 8L / (1 << 20)} MB)")

    def cut(scored: DataFrame): DataFrame = scored
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"))
      .agg(GraftFunctions.boundedTopK(col("adc"), col("neighbor_id"), 64).as("top"))

    def run(label: String, scored: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      // order-independent sum of per-pair hashes: identical survivor
      // SETS ⇒ identical (pairs, chk); the sum (not xor) keeps
      // duplicated pairs from cancelling. Decimal sum mod 2^64 —
      // HashDump's pattern — because a long sum of xxhash64 values
      // overflows under ANSI arithmetic.
      val two64 = new java.math.BigDecimal(
        java.math.BigInteger.ONE.shiftLeft(64))
      val s = cut(scored)
        .select(col("query_id"), explode(col("top")).as("t"))
        .agg(count(lit(1)).as("pairs"),
          pmod(sum(xxhash64(col("query_id"), col("t.i"))
              .cast("decimal(38,0)")),
            lit(two64)).cast("decimal(38,0)").cast("string").as("chk"))
        .head
      println(f"ADC_BENCH $label pairs=${s.getLong(0)} chk=${s.getString(1)} " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    run("blocked_kernel", Similarity.adcScanBlocked(codes, luts, w, m, 64))
    run("row_at_a_time", codes.crossJoin(broadcast(luts))
      .select(col("query_id"), col("neighbor_id"),
        GraftFunctions.adcLookupSum(col("codes"), col("lut"), w).as("adc")))
    spark.stop()
  }
}
