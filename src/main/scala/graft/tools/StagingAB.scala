package graft.tools

/** A/B the staging dedup posture at sweep scale (VERDICT r13 #4):
  * `StagingLayer.clean` parity default is a full-row dropDuplicates —
  * at sf10 that shuffles all 16 wide columns of the 60 M-row synthetic
  * inventory and is the dominant cost of the e2e dashboard pipelines
  * (q55 was the heaviest non-ANN row of every sf10 sweep). The
  * `hashDedup` flag (r13) shuffles one md5 key instead; this tool
  * measures both postures on the same corpus, driving the pipeline to
  * the fact-table count (no caching, so the staging cost is IN the
  * measurement).
  *
  * Usage: runMain graft.tools.StagingAB <sfDir> [runsPerMode]
  */
object StagingAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.defaultBuilder(
      s"local[${graft.GraftSession.availableCores}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    Seq(false, true).foreach { hd =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val out = graft.etl.Pipeline.runBatch(
          graft.QueryCatalog.synthInventory(spark, dir),
          cacheStaging = false, hashDedup = hd)
        val n = out.factSales.count()
        println(f"STAGING_AB hashDedup=$hd run$i rows=$n " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
