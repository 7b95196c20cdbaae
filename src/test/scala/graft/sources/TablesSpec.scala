package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, min, unix_timestamp}
import org.apache.spark.sql.types.TimestampType

/** Loader-level guarantees of [[Tables]] that the shared test session
  * would otherwise mask: SparkSpec disables NTZ inference at build
  * time, so without an explicit flip these paths are dead in CI
  * (ADVICE r6). The conf is runtime-settable, so flipping it on the
  * shared session faithfully models a bare caller session.
  */
class TablesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("load normalizes naive parquet timestamps to TIMESTAMP on an NTZ-inferring session") {
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "true") // model a caller session at Spark defaults
      // Control: with inference ON, a raw read of this file yields NTZ —
      // proving the fixture actually exercises the path under test.
      val raw = spark.read.parquet(Tables.path(dir, "orders"))
      assert(raw.schema("o_orderdate").dataType.typeName == "timestamp_ntz")
      val viaLoader = Tables.load(spark, dir, "orders")
      assert(viaLoader.schema("o_orderdate").dataType == TimestampType)
      // the loader must not leak its conf flip into the caller's session
      // (the caller's OWN parquet reads keep NTZ semantics)
      assert(spark.conf.get(key) == "true",
        "Tables.load must restore the caller's NTZ-inference setting")
      // UTC-instant semantics: the epoch seconds must equal the raw
      // micros of the file (naive = UTC instant, no session-tz fold).
      spark.conf.set(key, "false")
      val expected = spark.read.parquet(Tables.path(dir, "orders"))
        .agg(min(unix_timestamp(col("o_orderdate")))).head.getLong(0)
      spark.conf.set(key, "true")
      val got = Tables.load(spark, dir, "orders")
        .agg(min(unix_timestamp(col("o_orderdate")))).head.getLong(0)
      assert(got == expected)
    } finally spark.conf.set(key, saved)
  }

  test("load is session-timezone-invariant: non-UTC sessions read the same UTC instants") {
    // The tz-safety claim in Tables.load's scaladoc: disabling NTZ
    // inference AT READ TIME maps the file's naive micros straight to
    // a UTC instant, where a post-read NTZ→TIMESTAMP cast would fold
    // through the session wall-clock and shift every value by the
    // session offset. Pin it with an actual non-UTC session.
    val tzKey = "spark.sql.session.timeZone"
    val ntzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val savedTz = spark.conf.get(tzKey)
    val savedNtz = spark.conf.get(ntzKey)
    try {
      val utc = Tables.load(spark, dir, "orders")
        .agg(min(unix_timestamp(col("o_orderdate")))).head.getLong(0)
      spark.conf.set(ntzKey, "true") // a caller session at Spark defaults…
      spark.conf.set(tzKey, "America/Los_Angeles") // …in a non-UTC zone
      val la = Tables.load(spark, dir, "orders")
        .agg(min(unix_timestamp(col("o_orderdate")))).head.getLong(0)
      assert(la == utc,
        s"naive micros must land on the same UTC instant in any session tz (got $la vs $utc)")
    } finally {
      spark.conf.set(tzKey, savedTz)
      spark.conf.set(ntzKey, savedNtz)
    }
  }

  test("load leaves the session readable for every table under NTZ defaults") {
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "true")
      Tables.names.foreach { n =>
        val df = Tables.load(spark, dir, n)
        assert(!df.schema.fields.exists(_.dataType.typeName == "timestamp_ntz"),
          s"table $n still carries TIMESTAMP_NTZ")
        assert(df.limit(1).count() == 1)
      }
    } finally spark.conf.set(key, saved)
  }
}
