package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Measure ANN recall at an arbitrary corpus scale with the autos'
  * chosen parameters (VERDICT r15 #3: the autoQuantBits/probeBudget/
  * autoAdcRerank recall gates are measured at n = 20 000 organic
  * vectors — 0.820 sign-IVF / 0.842 IVFADC at the 438 ‰ budget — and
  * the sf30 probe timed the family at 600 k but never measured recall
  * there). One [[Similarity.recallProbeCurve]] run over a
  * deterministic `maxQueries` sample (the q199 production posture —
  * ground truth is the sweep's |Q|·n dominant cost, and recall is a
  * mean over queries, so a fixed sample estimates it unbiased at any
  * n), at exactly the parameters the autos would pick for the corpus:
  * bits = autoQuantBits(n, 64), rerank = autoAdcRerank(n), grid =
  * {63, 188, 438} ‰ of the lists (the q177 catalog grid — 438 ‰ is
  * `probeBudget`'s default serving fraction, the number this tool
  * exists to validate at scale).
  *
  * Usage: runMain graft.tools.RecallScale <sfDir> [maxQueries=256] [qMod=50]
  *   Prints one RECALL_SCALE line per (family, grid point):
  *   n, bits, nProbe, rerank, hits/n_pairs, recall, plus total wall.
  */
object RecallScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val maxQ = if (args.length > 1) args(1).toInt else 256
    val qMod = if (args.length > 2) args(2).toInt else 50
    val e = Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val bits = Similarity.autoQuantBits(n, 64)
    val rerank = Similarity.autoAdcRerank(n)
    val grid = Seq(63, 188, 438).map(Similarity.probeBudget(bits, _))
    println(s"RECALL_SCALE n=$n bits=$bits (${1 << bits} lists) " +
      s"rerank=$rerank grid=${grid.mkString(",")} maxQueries=$maxQ")
    val ckpt = java.nio.file.Files
      .createTempDirectory("recall_scale_").toString
    val t0 = System.nanoTime()
    val rows = Similarity.recallProbeCurve(
        e.filter(col("vec_id") % qMod === 0), e,
        k = 5, dim = 64, bits = bits, probeGrid = grid,
        m = 8, rerank = rerank,
        checkpointDir = Some(ckpt), maxQueries = Some(maxQ))
      .orderBy(col("family"), col("n_probe"))
      .collect()
    val wall = (System.nanoTime() - t0) / 1e9
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits"); val np = r.getAs[Long]("n_pairs")
      println(f"RECALL_SCALE ${r.getAs[String]("family")}%-8s " +
        f"nProbe=${r.getAs[Int]("n_probe")}%4d hits=$hits/$np " +
        f"recall=${hits.toDouble / np}%.3f")
    }
    println(f"RECALL_SCALE wall=$wall%.1f s")
    spark.stop()
  }
}
