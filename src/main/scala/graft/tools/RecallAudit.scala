package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.defaultBuilder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(q, e, 5))
    for ((pl, tb) <- Seq((6, 8), (5, 10), (4, 8), (6, 16))) {
      val t0 = System.nanoTime()
      val lsh = pairs(Similarity.lshTopK(q, e, 5, dim = 64, nPlanes = pl, nTables = tb))
      println(f"RECALL planes=$pl tables=$tb lsh=${lsh.intersect(exact).size.toDouble / exact.size}%.3f t=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    for ((nl, np, it) <- Seq((16, 4, 8), (16, 6, 8), (8, 3, 8), (32, 12, 8),
        (64, 24, 8), (16, 6, 20), (32, 12, 20), (24, 9, 12))) {
      val t0 = System.nanoTime()
      val ivf = pairs(Similarity.ivfTopK(q, e, 5, nLists = nl, nProbe = np, trainIters = it))
      println(f"RECALL ivf lists=$nl probe=$np iters=$it r=${ivf.intersect(exact).size.toDouble / exact.size}%.3f t=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
