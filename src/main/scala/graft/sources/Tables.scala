package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (TESTDATA.md). One parquet file per table under a scale-factor dir.
  *
  * At 100 TB these would be partitioned/bucketed table roots instead of
  * single files; the API stays the same — `spark.read.parquet(path)`
  * handles a directory of part-files identically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // TIMESTAMP(NANOS) parquet (events.ts) is unreadable without this
    // legacy flag; set it defensively so queries work on any session
    // the caller provides, not only our own mains'. Runtime-settable.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Naive parquet timestamps (isAdjustedToUTC=false, the driver's
    // testdata encoding) would read as TIMESTAMP_NTZ on sessions with
    // default NTZ inference — a type that forbids numeric casts and
    // diverges from how the DuckDB oracle treats the same values
    // (naive = UTC instant). Disabling inference at read time is
    // tz-safe: the raw micros become a UTC instant directly, with no
    // session-timezone fold (a post-read NTZ→TIMESTAMP cast would
    // interpret the wall-clock in the session tz instead). The conf is
    // SAVED AND RESTORED around the read — schema inference happens
    // eagerly at read(), so the returned frame keeps TIMESTAMP while
    // the caller's own unrelated parquet reads keep their session's
    // semantics (TablesSpec asserts both).
    val ntzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val ntzSaved = spark.conf.get(ntzKey)
    val df =
      try {
        spark.conf.set(ntzKey, "false")
        spark.read.parquet(path(dir, name))
      } finally spark.conf.set(ntzKey, ntzSaved)
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as
    // long (spark.sql.legacy.parquet.nanosAsLong) — convert to a µs
    // timestamp with integral division (double division would lose
    // precision past 2^53 ns).
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** Register every table as a temp view so `spark.sql` serves the same
    * query texts the reference's dashboard sends to Postgres
    * (reference: dashboard.py:29-122 — serving moves into Spark SQL).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
