package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-factor multiplier for the driver testdata: writes an
  * `sfX = copies × sf0.1` dataset by unioning key-shifted copies of
  * every table, preserving referential integrity (copy i of orders
  * references copy i of customer/part/supplier, etc.). Dims
  * region/nation stay fixed, like TPC-H's scale-invariant tables.
  * Key spans round up to a multiple of 1000 so the catalog's
  * `key % 50/100`-style query-set selectors keep the same per-copy
  * selectivity. Content columns are copied verbatim — so the dedup
  * family sees every document with `copies−1` exact twins, which is
  * the boilerplate-heavy shape those operators are built for and a
  * deliberate stress of their bucket caps.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <copies>
  * (local tooling only — the driver's own testdata is read-only).
  */
object ScaleUp {
  /** key columns to shift, per table: (table, ownKey, fk → spanOfTable) */
  private val shiftCols: Map[String, Seq[(String, String)]] = Map(
    "customer" -> Seq("c_custkey" -> "customer"),
    "supplier" -> Seq("s_suppkey" -> "supplier"),
    "part" -> Seq("p_partkey" -> "part"),
    "orders" -> Seq("o_orderkey" -> "orders", "o_custkey" -> "customer"),
    "lineitem" -> Seq("l_orderkey" -> "orders", "l_partkey" -> "part",
      "l_suppkey" -> "supplier"),
    "events" -> Seq("event_id" -> "events", "user_id" -> "events_user"),
    "documents" -> Seq("doc_id" -> "documents"),
    "embeddings" -> Seq("vec_id" -> "embeddings"))

  private def roundSpan(maxKey: Long): Long = ((maxKey / 1000L) + 1L) * 1000L

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("WARN")
    // spans from the SOURCE data, one tiny agg per keyed table
    def span(table: String, key: String): Long =
      roundSpan(Tables.load(spark, srcDir, table)
        .agg(max(col(key))).head.getLong(0))
    val spans: Map[String, Long] = Map(
      "customer" -> span("customer", "c_custkey"),
      "supplier" -> span("supplier", "s_suppkey"),
      "part" -> span("part", "p_partkey"),
      "orders" -> span("orders", "o_orderkey"),
      "events" -> span("events", "event_id"),
      "events_user" -> span("events", "user_id"),
      "documents" -> span("documents", "doc_id"),
      "embeddings" -> span("embeddings", "vec_id"))
    val copyIdx = broadcast(spark.range(copies).toDF("__i"))
    Tables.names.foreach { t =>
      val src = Tables.load(spark, srcDir, t)
      val out: DataFrame = shiftCols.get(t) match {
        case None => src // region/nation: scale-invariant dims
        case Some(cols) =>
          val crossed = src.crossJoin(copyIdx)
          val shifted = cols.foldLeft(crossed) { case (df, (c, spanKey)) =>
            df.withColumn(c, col(c) + col("__i") * spans(spanKey))
          }
          shifted.drop("__i")
      }
      out.write.mode("overwrite").parquet(Tables.path(outDir, t))
      println(s"[scaleup] $t -> ${Tables.path(outDir, t)}")
    }
    spark.stop()
  }
}
