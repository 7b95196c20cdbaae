package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
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
