package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Attribute q175/q181's residual sweep cost (VERDICT r14 #3): the two
  * queries moved least under the r14 BoundedTopK/adcScan work because
  * their candidate streams were already narrow — the hypothesis is
  * that the per-invocation INDEX REBUILD dominates (by design: q175 is
  * the in-flight operator, q181 rebuilds + appends + compacts before
  * serving). This tool times the stages separately at a given scale:
  *
  *   build        — buildIvfAdcIndex (centroids + residual encode +
  *                  codes/codebook writes; the rebuild every q175
  *                  invocation pays in-flight)
  *   serve_full   — queryIvfAdcIndex at the catalog's occupancy-tuned
  *                  parameters (probe + partition-pruned ADC + rerank)
  *   serve_r5     — same with rerank = 5: serve_full − serve_r5 ≈ the
  *                  exact-rerank fetch's share of serving
  *   serve_p1     — same with nProbe = 1: the probe-width share
  *   inflight     — ivfAdcTopK end to end (the q175 body; ≈ build +
  *                  serve_full minus the persisted index's write/read)
  *
  * Usage: runMain graft.tools.IvfAdcDecompose <sfDir> [runs]
  */
object IvfAdcDecompose {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val bits = Similarity.autoQuantBits(n, 64)
    val rerank = Similarity.autoAdcRerank(n)
    val nProbe = Similarity.probeBudget(bits, 438)
    val q = e.filter(col("vec_id") % 50 === 0)
    val path = "/tmp/ivfadc_decompose"
    println(s"DECOMP n=$n bits=$bits rerank=$rerank nProbe=$nProbe |Q|=${q.count()}")
    def time(label: String)(f: => Long): Unit = (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val rows = f
      println(f"DECOMP $label run$i rows=$rows t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("build") {
      Similarity.buildIvfAdcIndex(e, path, dim = 64, bits = bits, m = 8); 0L
    }
    time("serve_full")(Similarity.queryIvfAdcIndex(spark, path, q, e,
      k = 5, dim = 64, bits = bits, nProbe = nProbe, m = 8, rerank = rerank).count())
    time("serve_r5")(Similarity.queryIvfAdcIndex(spark, path, q, e,
      k = 5, dim = 64, bits = bits, nProbe = nProbe, m = 8, rerank = 5).count())
    time("serve_p1")(Similarity.queryIvfAdcIndex(spark, path, q, e,
      k = 5, dim = 64, bits = bits, nProbe = 1, m = 8, rerank = rerank).count())
    time("inflight")(Similarity.ivfAdcTopK(q, e,
      k = 5, dim = 64, bits = bits, nProbe = nProbe, m = 8, rerank = rerank).count())
    spark.stop()
  }
}
