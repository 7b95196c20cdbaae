package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Step-level cost attribution for q181's maintenance loop (r16 "not
  * yet optimized" #3): build / append / compact / serve timed
  * separately, twice, so the FS-metadata-heavy step is named instead
  * of guessed. Usage: runMain graft.tools.Q181Decompose <sfDir> [runs]
  */
object Q181Decompose {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 2
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val bits = Similarity.autoQuantBits(n, 64)
    val rerank = Similarity.autoAdcRerank(n)
    val nProbe = Similarity.probeBudget(bits, 438)
    (1 to runs).foreach { i =>
      val path = java.nio.file.Files.createTempDirectory("q181dec").toString
      def time(label: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"Q181 run$i $label%-8s t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("build")(Similarity.buildIvfAdcIndex(
        e.filter(col("vec_id") % 3 =!= 0), path, dim = 64, bits = bits, m = 8))
      time("append")(Similarity.appendIvfAdcIndex(
        e.filter(col("vec_id") % 3 === 0), path, batchId = "b1",
        dim = 64, bits = bits, m = 8))
      time("compact")(Similarity.compactIvfAdcIndex(spark, path, bits = bits))
      time("serve")(Similarity.queryIvfAdcIndex(spark, path,
        e.filter(col("vec_id") % 50 === 0), e, k = 5, dim = 64, bits = bits,
        nProbe = nProbe, m = 8, rerank = rerank)
        .orderBy(col("query_id"), col("rank")).count())
    }
    spark.stop()
  }
}
