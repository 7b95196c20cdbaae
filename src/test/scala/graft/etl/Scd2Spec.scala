package graft.etl

import java.sql.Timestamp

import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private val t0 = Timestamp.valueOf("2023-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")

  // existing dim: key 1 unchanged, key 2 will change, key 3 absent from new
  private def existing =
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "v")
      .withColumn("start_date", org.apache.spark.sql.functions.lit(t0))
      .withColumn("end_date",
        org.apache.spark.sql.functions.lit(null).cast("timestamp"))
      .withColumn("is_current", org.apache.spark.sql.functions.lit(true))

  // new batch: key 1 identical, key 2 changed value, key 4 brand-new
  private def newBatch =
    Seq((1L, "a", 10L), (2L, "b", 99L), (4L, "d", 40L)).toDF("k", "name", "v")

  test("reference: brand-new keys are dropped by the 3VL change filter") {
    val out = Scd2.reference(newBatch, existing, "k", Seq("name", "v"), t1)
    assert(!out.select("k").collect().map(_.getLong(0)).contains(4L))
  }

  test("reference: unchanged rows get expired; changed key survives as current") {
    val out = Scd2.reference(newBatch, existing, "k", Seq("name", "v"), t1)
    val rows = out.select("k", "is_current").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows === Map(1L -> false, 3L -> false, 2L -> true))
  }

  test("reference: old version of a changed key vanishes (no history)") {
    val out = Scd2.reference(newBatch, existing, "k", Seq("name", "v"), t1)
    val key2 = out.filter(out("k") === 2L).collect()
    assert(key2.length === 1)
    assert(key2.head.getAs[Long]("v") === 99L)
  }

  test("corrected: changed key gets old version expired + new version current") {
    val out = Scd2.corrected(newBatch, existing, "k", Seq("name", "v"), t1)
    val key2 = out.filter(out("k") === 2L)
      .select("v", "is_current", "end_date").collect()
    assert(key2.length === 2)
    val (old, cur) = key2.partition(!_.getBoolean(1))
    assert(old.head.getLong(0) === 20L && old.head.getTimestamp(2) === t1)
    assert(cur.head.getLong(0) === 99L && cur.head.isNullAt(2))
  }

  test("corrected: unchanged and missing-from-batch keys stay current") {
    val out = Scd2.corrected(newBatch, existing, "k", Seq("name", "v"), t1)
    val flags = out.filter(out("k").isin(1L, 3L))
      .select("k", "is_current").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
    assert(flags.toSet === Set(1L -> true, 3L -> true))
  }

  test("corrected: brand-new keys are inserted as current") {
    val out = Scd2.corrected(newBatch, existing, "k", Seq("name", "v"), t1)
    val key4 = out.filter(out("k") === 4L).collect()
    assert(key4.length === 1)
    assert(key4.head.getAs[Boolean]("is_current"))
  }

  test("corrected invariant: at most one current row per key") {
    val out = Scd2.corrected(newBatch, existing, "k", Seq("name", "v"), t1)
    val maxCurrent = out.filter(out("is_current"))
      .groupBy("k").count()
      .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(maxCurrent === 1L)
  }

  test("corrected: null→value counts as a change (null-safe compare)") {
    val ex = Seq((1L, Option.empty[String], 10L)).toDF("k", "name", "v")
      .withColumn("start_date", org.apache.spark.sql.functions.lit(t0))
      .withColumn("end_date",
        org.apache.spark.sql.functions.lit(null).cast("timestamp"))
      .withColumn("is_current", org.apache.spark.sql.functions.lit(true))
    val nb = Seq((1L, "now-set", 10L)).toDF("k", "name", "v")
    val out = Scd2.corrected(nb, ex, "k", Seq("name", "v"), t1)
    assert(out.count() === 2) // expired old + new current
  }

  test("firstLoad stamps everything current with null end_date") {
    val out = Scd2.firstLoad(newBatch, t1)
    assert(out.filter(out("is_current")).count() === 3)
    assert(out.filter(out("end_date").isNull).count() === 3)
  }
}
