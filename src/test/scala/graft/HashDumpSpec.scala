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
    // one row, one string column "k": cell = type tag 'S' + "k", row
    // string = "Sk", md5("Sk") = de06a156d85e5404406f3c9e7cac0919 —
    // a = 0xDE06A156D85E5404, b = 0x406F3C9E7CAC0919 as unsigned sums
    val d = digest(Seq(Tuple1("k")).toDF("v"))
    assert(d.getAs[String]("graft_digest_a") ===
      java.lang.Long.toUnsignedString(0xDE06A156D85E5404L))
    assert(d.getAs[String]("graft_digest_b") ===
      java.lang.Long.toUnsignedString(0x406F3C9E7CAC0919L))
  }

  // the three digest metacharacters, built without escape-sequence
  // literals so the intent is unmissable
  private val sep = 1.toChar.toString
  private val nul = 2.toChar.toString
  private val esc = 3.toChar.toString

  test("cells are type-tagged: long 5 and string \"5\" digest apart (ADVICE r12)") {
    val asLong = digest(Seq(Tuple1(5L)).toDF("v"))
    val asStr = digest(Seq(Tuple1("5")).toDF("v"))
    assert(asLong.getAs[String]("graft_digest_a") !==
      asStr.getAs[String]("graft_digest_a"))
    val asBool = digest(Seq(Tuple1(true)).toDF("v"))
    val boolStr = digest(Seq(Tuple1("true")).toDF("v"))
    assert(asBool.getAs[String]("graft_digest_a") !==
      boolStr.getAs[String]("graft_digest_a"))
  }

  test("a literal NULL-sentinel string is not digest-equal to NULL (ADVICE r12)") {
    val isNull = digest(Seq((1L, null: String)).toDF("n", "s"))
    val looksNull = digest(Seq((1L, nul)).toDF("n", "s"))
    assert(isNull.getAs[String]("graft_digest_a") !==
      looksNull.getAs[String]("graft_digest_a"))
  }

  test("separator chars in string cells cannot shift cell boundaries (ADVICE r12)") {
    // without escaping, both rows would render "Sa" sep "Sb" sep "Sc"
    val left = digest(Seq((s"a${sep}b", "c")).toDF("a", "b"))
    val right = digest(Seq(("a", s"b${sep}c")).toDF("a", "b"))
    assert(left.getAs[String]("graft_digest_a") !==
      right.getAs[String]("graft_digest_a"))
    // the escape char itself is escaped — no second-order aliasing
    val e1 = digest(Seq((s"${esc}1", "")).toDF("a", "b"))
    val e2 = digest(Seq((esc, "1")).toDF("a", "b"))
    assert(e1.getAs[String]("graft_digest_a") !==
      e2.getAs[String]("graft_digest_a"))
  }
}
