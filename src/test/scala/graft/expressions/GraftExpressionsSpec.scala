package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("kernels: shingle set is sorted distinct; minhash minima are consistent") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("a b a b a b c")
    val set = Kernels.shingleSet(s, 2, charLevel = false)
    assert(set.toSeq === set.toSeq.sorted)
    assert(set.toSeq.distinct === set.toSeq)
    assert(set.length === 3) // "a b", "b a", "b c"
    val sig = Kernels.minhash(s, 2, 8, charLevel = false)
    assert(sig.length === 8)
    // signature values must be minima of the per-permutation hashes of
    // the set — recomputing from the set agrees
    assert(sig.toSeq === Kernels.minhashFromHashes(
      Kernels.tokenShingleHashes(s, 2), 8).toSeq)
  }

  test("kernels: jaccardSorted edge cases") {
    assert(Kernels.jaccardSorted(Array.emptyLongArray, Array.emptyLongArray) === 1.0)
    assert(Kernels.jaccardSorted(Array(1L, 2L), Array.emptyLongArray) === 0.0)
    assert(Kernels.jaccardSorted(Array(1L, 2L, 3L), Array(2L, 3L, 4L)) === 0.5)
  }

  test("expressions evaluate identically via codegen and interpreted paths") {
    val df = Seq((1L, "the quick brown fox"), (2L, "")).toDF("id", "t")
    val cols = Seq(
      GraftFunctions.simhash64(col("t")).as("sh"),
      GraftFunctions.minhashSig(col("t"), 3, 8, false).as("mh"),
      GraftFunctions.shingleSet(col("t"), 4, true).as("ss"))
    val codegen = df.select(cols: _*).collect()
    // the plan above runs through whole-stage codegen; compare against
    // direct (interpreted-path) kernel calls
    import org.apache.spark.unsafe.types.UTF8String
    val expected = Seq("the quick brown fox", "").map { s =>
      (Kernels.simhash(UTF8String.fromString(s)),
        Kernels.minhash(UTF8String.fromString(s), 3, 8, false).toSeq,
        Kernels.shingleSet(UTF8String.fromString(s), 4, true).toSeq)
    }
    codegen.zip(expected).foreach { case (row, (sh, mh, ss)) =>
      assert(row.getLong(0) === sh)
      assert(row.getSeq[Long](1) === mh)
      assert(row.getSeq[Long](2) === ss)
    }
  }

  test("null inputs propagate as null") {
    val df = Seq(Option.empty[String], Some("x y z")).toDF("t")
    val out = df.select(
      GraftFunctions.simhash64(col("t")).as("sh"),
      GraftFunctions.minhashSig(col("t"), 2, 4, false).as("mh")).collect()
    assert(out.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("vec_dot / vec_cosine match hand computation incl. zero-norm") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f)),
    ).toDF("a", "b")
    val out = df.select(
      GraftFunctions.vecDot(col("a"), col("b")).as("d"),
      GraftFunctions.vecCosine(col("a"), col("b")).as("c")).collect()
    assert(out(0).getDouble(0) === 32.0)
    assert(math.abs(out(0).getDouble(1) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(out(1).getDouble(0) === 0.0)
    assert(out(1).getDouble(1) === 0.0) // zero-norm → 0.0, not NaN
  }

  test("SQL registration: functions callable from spark.sql") {
    GraftExtensions.register(spark)
    Seq((1L, "hello world hello world")).toDF("id", "text")
      .createOrReplaceTempView("ge_docs")
    val r = spark.sql(
      """SELECT simhash64(text) AS sh,
        |       size(minhash_sig(text, 2, 8, false)) AS k,
        |       jaccard_sorted(shingle_set(text, 2, false),
        |                      shingle_set(text, 2, false)) AS j,
        |       size(winnow(text, 4, 2)) AS nfp
        |FROM ge_docs""".stripMargin).head
    assert(r.getLong(0) !== 0L)
    assert(r.getInt(1) === 8)
    assert(r.getDouble(2) === 1.0)
    assert(r.getInt(3) > 0)
    spark.catalog.dropTempView("ge_docs")
  }

  test("hyperplane bucket: opposite vectors produce complementary buckets") {
    val planes = (0 until 8).flatMap(_ => Seq(0.5, -0.25, 0.125)).toIndexedSeq
    val df = Seq(Array(1f, 2f, 3f), Array(-1f, -2f, -3f)).toDF("v")
      .select(GraftFunctions.hyperplaneBucket(col("v"), planes, 8).as("b"))
    val Array(b1, b2) = df.collect().map(_.getLong(0))
    assert((b1 ^ b2) === 255L)
  }

  test("scatterLut places entries densely; unobserved cells stay 0") {
    val lut = Kernels.scatterLut(Array(3L, 0L, 5L), Array(30L, -7L, 50L), 8)
    assert(lut.toSeq === Seq(-7L, 0L, 0L, 30L, 0L, 50L, 0L, 0L))
  }

  test("adcLookupSum = Σⱼ lut[(j << w) + codes[j]] — hand case") {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    def ad(xs: Array[Long]) = UnsafeArrayData.fromPrimitiveArray(xs)
    // m = 2 blocks, w = 2 bits: lut cells 0-3 = block 0, 4-7 = block 1
    val lut = ad(Array(10L, 11L, 12L, 13L, 20L, 21L, 22L, 23L))
    // codes = [2, 1] → lut[2] + lut[4 + 1] = 12 + 21 = 33
    assert(Kernels.adcLookupSum(ad(Array(2L, 1L)), lut, 2) === 33L)
    // empty codes → 0 (vacuous sum)
    assert(Kernels.adcLookupSum(ad(Array.emptyLongArray), lut, 2) === 0L)
  }

  test("adc lookup expressions agree between codegen plan and kernels") {
    val df = Seq((Array(2L, 1L), Array(3L, 0L), Array(30L, -7L)))
      .toDF("codes", "idxs", "vals")
      .select(
        GraftFunctions.adcLookupSum(
          col("codes"),
          GraftFunctions.scatterLut(col("idxs"), col("vals"), 8), 2).as("adc"))
    // lut = [-7, 0, 0, 30, 0, 0, 0, 0]; codes [2, 1] → lut[2] + lut[5] = 0
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    assert(df.head.getLong(0) ===
      Kernels.adcLookupSum(
        UnsafeArrayData.fromPrimitiveArray(Array(2L, 1L)),
        UnsafeArrayData.fromPrimitiveArray(
          Kernels.scatterLut(Array(3L, 0L), Array(30L, -7L), 8)), 2))
    assert(df.head.getLong(0) === 0L)
  }
}
