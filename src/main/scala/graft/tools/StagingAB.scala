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
  * `--wide` (VERDICT r14 #5) measures the flag's CLAIMED regime
  * instead: the sf10 A/B above refuted the 16-column hypothesis (a
  * wash), so this mode drives the exact library dedup path
  * (`StagingLayer.dedupRows`, both postures) over a synthetic
  * wide-payload corpus — documents text plus 32 derived string
  * columns (~2.5 KB/row of payload crossing the dedup shuffle in the
  * full-row posture, 16 B of md5 in the keyed one) with 10% planted
  * exact-duplicate rows so the dedup performs real work.
  *
  * Usage: runMain graft.tools.StagingAB <sfDir> [runsPerMode] [--wide]
  */
object StagingAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.defaultBuilder(
      s"local[${graft.GraftSession.availableCores}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val runs = args.drop(1).find(!_.startsWith("--")).map(_.toInt).getOrElse(2)
    val wide = args.contains("--wide")
    Seq(false, true).foreach { hd =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val n =
          if (wide) graft.etl.StagingLayer.dedupRows(wideCorpus(spark, dir), hd).count()
          else graft.etl.Pipeline.runBatch(
            graft.QueryCatalog.synthInventory(spark, dir),
            cacheStaging = false, hashDedup = hd).factSales.count()
        println(f"STAGING_AB wide=$wide hashDedup=$hd run$i rows=$n " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }

  /** documents + 32 overlapping 64-char slices of the text as extra
    * string columns; every doc_id % 10 == 0 row appears twice
    * (EXACT duplicate — full-row and md5-key dedup must both remove
    * it, so row counts match across postures).
    */
  private def wideCorpus(
      spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.load(spark, dir, "documents")
    val w = d.select(d.columns.map(col).toIndexedSeq ++
      (0 until 32).map(i => substring(col("text"), i * 8 + 1, 64).as(s"w$i")): _*)
    w.unionByName(w.filter(col("doc_id") % 10 === 0))
  }
}
