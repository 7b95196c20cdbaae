package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BoundedTopK — the ANN ranking cut's bounded top-k aggregate. The
  * load-bearing claim is EXACT equivalence with the row_number window
  * it replaced (rankTopK/adcRerank/bruteForceTopK route every ANN
  * family result through it), so the specs compare against the window
  * form on adversarial data: duplicate scores (tie-break on id asc),
  * groups smaller than k, null scores (NULLS LAST), and
  * partitioning-independence (partial/merge paths).
  */
class BoundedTopKSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random pairs with many score collisions —
  // collisions are where a wrong tie-break would diverge
  private def pairs(n: Int, groups: Int, scoreMod: Int) =
    (1 to n).map { i =>
      val g = (i * 2654435761L) % groups
      (g, (i * 40503L) % scoreMod, i.toLong)
    }.toDF("g", "score", "id")

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("g", "id", "rank")
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(GraftFunctions.boundedTopK(col("score"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.i").as("id"), (col("pos") + 1).cast("int").as("rank"))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("g", "rank").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  test("equals the row_number window on tie-heavy data") {
    val df = pairs(5000, groups = 37, scoreMod = 50) // ~2.7 ties per (g, score)
    assert(sortedRows(viaAgg(df, 5)) === sortedRows(viaWindow(df, 5)))
  }

  test("groups smaller than k emit all members, rank-ordered") {
    val df = pairs(40, groups = 25, scoreMod = 7) // most groups have < 5 rows
    assert(sortedRows(viaAgg(df, 5)) === sortedRows(viaWindow(df, 5)))
  }

  test("k = 1 and k larger than any group") {
    val df = pairs(300, groups = 11, scoreMod = 13)
    assert(sortedRows(viaAgg(df, 1)) === sortedRows(viaWindow(df, 1)))
    assert(sortedRows(viaAgg(df, 1000)) === sortedRows(viaWindow(df, 1000)))
  }

  test("null scores rank last (the window's DESC NULLS LAST), null ids skipped") {
    val df = Seq[(Long, Option[Long], Option[Long])](
      (1L, Some(10L), Some(1L)), (1L, None, Some(2L)), (1L, Some(5L), Some(3L)),
      (1L, None, Some(4L)), (1L, Some(5L), None),
      (2L, None, Some(7L)), (2L, None, Some(6L)),
    ).toDF("g", "score", "id")
    val got = viaAgg(df.filter(col("id").isNotNull), 3)
    val want = viaWindow(df.filter(col("id").isNotNull), 3)
    assert(sortedRows(got) === sortedRows(want))
    // null id rows are skipped by the aggregate itself, no filter needed
    assert(sortedRows(viaAgg(df, 3)) === sortedRows(want))
  }

  test("result is partitioning-independent (partial + merge paths)") {
    val df = pairs(2000, groups = 7, scoreMod = 20)
    val one = sortedRows(viaAgg(df.repartition(1), 4))
    assert(sortedRows(viaAgg(df.repartition(13), 4)) === one)
    assert(sortedRows(viaAgg(df.repartition(4, col("id")), 4)) === one)
  }

  test("exchange carries heaps, not scored rows: plan has no Window, has ObjectHashAggregate") {
    val plan = viaAgg(pairs(100, 5, 10), 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"no object hash agg:\n$plan")
  }

  test("sort-based fallback path (threshold = 2) is bit-identical to the hash path") {
    // ObjectHashAggregateExec falls back to sort-based aggregation once
    // a task sees more distinct keys than the threshold; GraftSession
    // raises the default so the ANN cuts stay hashed, but correctness
    // must NOT depend on which path runs (SCALING.md r14's claim, now
    // pinned): threshold = 2 forces every multi-group task through the
    // fallback — serialize/merge of mid-build heaps included.
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prior = spark.conf.get(key)
    val df = pairs(5000, groups = 37, scoreMod = 50)
    val hashed = sortedRows(viaAgg(df, 5))
    try {
      spark.conf.set(key, "2")
      assert(sortedRows(viaAgg(df, 5)) === hashed)
      assert(sortedRows(viaAgg(df.repartition(13), 5)) === hashed)
    } finally spark.conf.set(key, prior)
  }

  test("heap unit semantics: worst-at-root replacement under (score desc, id asc)") {
    val h = new TopKHeap(3)
    Seq((5L, 10L), (5L, 2L), (7L, 9L), (1L, 1L), (5L, 1L), (7L, 50L))
      .foreach { case (s, i) => h.offer(s, i) }
    val got = h.sortedIndices.map(i => (h.scores(i), h.ids(i))).toSeq
    // top-3 by (score desc, id asc): (7,9), (7,50), (5,1)
    assert(got === Seq((7L, 9L), (7L, 50L), (5L, 1L)))
  }
}
