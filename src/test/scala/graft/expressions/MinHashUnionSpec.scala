package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashUnionSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    ("a", "the quick brown fox jumps over the dog"),
    ("a", "a completely different second document"),
    ("b", "the quick brown fox jumps over the dog"),
  ).toDF("source", "text")

  test("group signature equals elementwise min of member signatures") {
    val sigs = docs.select(col("source"),
      GraftFunctions.minhashSig(col("text"), 2, 8, charLevel = false).as("sig"))
    val grouped = sigs.groupBy("source")
      .agg(GraftFunctions.minhashUnion(col("sig"), 8).as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val members = sigs.collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getSeq[Long](1)))
    members.foreach { case (src, ms) =>
      val expected = (0 until 8).map(i => ms.map(_(i)).min)
      assert(grouped(src) === expected, s"source $src")
    }
    // single-member group's union is the member's own signature
    assert(grouped("b") === members("b").head)
  }

  test("result is partitioning-independent (merge is associative+commutative)") {
    val many = (1 to 200).map(i => (s"s${i % 3}", s"doc number $i with words $i ${i * 7}"))
      .toDF("source", "text")
    def run(parts: Int) = many.repartition(parts)
      .select(col("source"), GraftFunctions.minhashSig(col("text"), 2, 16, false).as("sig"))
      .groupBy("source")
      .agg(GraftFunctions.minhashUnion(col("sig"), 16).as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(run(1) === run(7))
  }

  test("SQL registration: minhash_union callable as an aggregate") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("mhu_docs")
    val r = spark.sql(
      """SELECT source, size(minhash_union(minhash_sig(text, 2, 8, false), 8)) AS k
        |FROM mhu_docs GROUP BY source ORDER BY source""".stripMargin).collect()
    assert(r.map(_.getInt(1)).toSeq === Seq(8, 8))
    spark.catalog.dropTempView("mhu_docs")
  }
}
