package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the engine-side digest (VERDICT r11 #4) that hash-dump Verify
  * ships instead of full results. Cross-engine equality (Spark digest
  * == the Python mirror over DuckDB oracle rows) is validated by the
  * tri-scale gate run with SPARK_GRAFT_HASHDUMP=1; these specs pin the
  * digest's algebraic properties — the ways a cheaper digest would go
  * silently wrong.
  */
class HashDumpSpec extends SparkSpec {
  import spark.implicits._

  private def digest(df: org.apache.spark.sql.DataFrame): Row =
    HashDump.digestFrame(df).get.collect()(0)

  test("digest is row-order and partitioning independent") {
    val df = (1 to 500).map(i => (i.toLong, s"s$i", i / 7.0)).toDF("a", "b", "c")
    val d1 = digest(df)
    val d2 = digest(df.orderBy($"c".desc))
    val d3 = digest(df.repartition(13))
    assert(d1 === d2)
    assert(d1 === d3)
  }

  test("duplicate rows do not cancel (sum, not xor)") {
    val once = digest(Seq(("x", 1L)).toDF("s", "n"))
    val thrice = digest(Seq(("x", 1L), ("x", 1L), ("x", 1L)).toDF("s", "n"))
    assert(once.getAs[Long]("graft_digest_rows") === 1L)
    assert(thrice.getAs[Long]("graft_digest_rows") === 3L)
    assert(once.getAs[String]("graft_digest_a") !==
      thrice.getAs[String]("graft_digest_a"))
  }

  test("null, empty string, and the sentinel-free value all hash apart") {
    val withNull = digest(Seq((1L, null: String)).toDF("n", "s"))
    val withEmpty = digest(Seq((1L, "")).toDF("n", "s"))
    assert(withNull.getAs[String]("graft_digest_a") !==
      withEmpty.getAs[String]("graft_digest_a"))
  }

  test("doubles hash by IEEE bits: NaNs collapse, -0.0 stays distinct, values distinguish") {
    val nan1 = digest(Seq(Tuple1(Double.NaN)).toDF("d"))
    val nan2 = digest(spark.sql(
      "SELECT CAST('NaN' AS DOUBLE) + 1.0 AS d")) // a computed NaN
    assert(nan1.getAs[String]("graft_digest_a") ===
      nan2.getAs[String]("graft_digest_a"))
    val pz = digest(Seq(Tuple1(0.0)).toDF("d"))
    val nz = digest(Seq(Tuple1(-0.0)).toDF("d"))
    assert(pz.getAs[String]("graft_digest_a") !== nz.getAs[String]("graft_digest_a"))
    val a = digest(Seq(Tuple1(0.1 + 0.2)).toDF("d"))
    val b = digest(Seq(Tuple1(0.3)).toDF("d"))
    assert(a.getAs[String]("graft_digest_a") !== b.getAs[String]("graft_digest_a"))
  }

  test("columns are digested in sorted-name order and reported as csv") {
    val ab = digest(Seq((1L, "x")).toDF("b", "a"))
    assert(ab.getAs[String]("graft_digest_cols") === "a,b")
    // same values, same (sorted) names, different declaration order:
    // identical digest — the driver compare's column canonicalization
    val ba = digest(Seq(("x", 1L)).toDF("a", "b"))
    assert(ab.getAs[String]("graft_digest_a") === ba.getAs[String]("graft_digest_a"))
  }

  test("empty frame digests to (0, 0, rows 0), not null") {
    val d = digest(Seq.empty[(Long, String)].toDF("n", "s"))
    assert(d.getAs[String]("graft_digest_a") === "0")
    assert(d.getAs[String]("graft_digest_b") === "0")
    assert(d.getAs[Long]("graft_digest_rows") === 0L)
  }

  test("unsupported column types refuse (full-dump fallback), loudly not wrongly") {
    val ts = spark.sql("SELECT TIMESTAMP'2024-01-01 00:00:00' AS t")
    assert(HashDump.digestFrame(ts).isEmpty)
    val arr = spark.sql("SELECT ARRAY(1L, 2L) AS a")
    assert(HashDump.digestFrame(arr).isEmpty)
  }

  test("known-value digest: the exact md5-sum arithmetic both mirrors compute") {
    // one row, one string column "k": row string = "k"(the cell is the
    // bare value), md5("k") = 8ce4b16b22b58894aa86c421e8759df3 —
    // a = 0x8ce4b16b22b58894, b = 0xaa86c421e8759df3 as unsigned sums
    val d = digest(Seq(Tuple1("k")).toDF("v"))
    assert(d.getAs[String]("graft_digest_a") ===
      java.lang.Long.toUnsignedString(0x8ce4b16b22b58894L))
    assert(d.getAs[String]("graft_digest_b") ===
      java.lang.Long.toUnsignedString(0xaa86c421e8759df3L))
  }
}
