package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: (a) partitioned-write task-width cost, (b) partitioned
  * read listing cost vs parallelPartitionDiscovery.threshold.
  */
object WriteExp {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val codes = e.select(col("vec_id").as("neighbor_id"),
      pmod(col("vec_id"), lit(128)).cast("int").as("list_id"),
      expr("transform(sequence(1,8), i -> CAST(vec_id % 16 AS INT))").as("codes"))
    def time(label: String)(f: => Any): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"EXP $label run$i t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("write_repart128") {
      codes.repartition(128, col("list_id"))
        .write.mode("overwrite").partitionBy("list_id").parquet("/tmp/wexp_128")
    }
    time("write_repart32") {
      codes.repartition(32, col("list_id"))
        .write.mode("overwrite").partitionBy("list_id").parquet("/tmp/wexp_32")
    }
    time("write_flat1") {
      codes.coalesce(1).write.mode("overwrite").parquet("/tmp/wexp_flat")
    }
    time("read_listing_default") {
      spark.read.parquet("/tmp/wexp_128").count()
    }
    spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
    time("read_listing_1024") {
      spark.read.parquet("/tmp/wexp_128").count()
    }
    spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
    time("read_listing_32again") {
      spark.read.parquet("/tmp/wexp_128").count()
    }
    spark.stop()
  }
}
