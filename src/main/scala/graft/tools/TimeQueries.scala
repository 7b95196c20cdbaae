package graft.tools
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.defaultBuilder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { q =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        println(f"TIMING $q run$i rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
