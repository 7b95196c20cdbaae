package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless range joins via range bucketing — the scale path for
  * "point falls in interval" and "intervals overlap" predicates that
  * have NO equi-key. Spark plans a bare inequality join as
  * BroadcastNestedLoopJoin (quadratic, one partition if neither side
  * broadcasts); bucketing the value domain turns it into an ordinary
  * shuffled equi-join on the bucket id, with the inequality applied as
  * a post-join filter inside each bucket.
  *
  * Contract and cost model (both joins):
  *  - integer (Long) domain — callers bucket time as day/second
  *    numbers and money as cents; bucket math is exact floor division
  *    (safe for negative values via `pmod`), never IEEE.
  *  - an interval of length L explodes into ceil(L/w)+1 ≤ L/w + 1
  *    bucket rows, so pick `bucketWidth` near the TYPICAL interval
  *    length: candidates per bucket are nPoints(bucket) ×
  *    nIntervals(bucket), the equi-join's ordinary skew exposure. A
  *    few degenerate mega-intervals are the salting case
  *    ([[ScaleJoins]]) — or split them into chunks of w first.
  *  - duplicate elimination is BY CONSTRUCTION, not a distinct: a
  *    point lives in exactly one bucket ([[pointInInterval]]), and an
  *    overlapping pair is emitted only from the single bucket
  *    containing max(loA, loB) ([[intervalOverlap]]) — no
  *    post-join dedup shuffle.
  *  - collapse duplicate intervals/points to (value, weight) rows
  *    upstream when the value domain is small (days, price bands):
  *    the join then scales with DISTINCT values, not rows — see the
  *    q166/q167 catalog queries for the pattern.
  */
object RangeJoin {

  /** Exact floor division on longs (DIV truncates toward zero, which
    * is wrong for negative values; subtracting the positive `pmod`
    * first makes the quotient exact for the whole Long domain).
    */
  private def bucketOf(colName: String, w: Long): String =
    s"((`$colName` - pmod(`$colName`, ${w}L)) DIV ${w}L)"

  private def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"range-join sides must have disjoint column names, both have: $shared")
  }

  /** Join each point row to every interval row whose half-open
    * [`loCol`, `hiCol`) range contains `pCol`. Output = all point
    * columns ++ all interval columns, one row per qualifying
    * (point, interval) pair. Empty intervals (hi ≤ lo) match nothing.
    */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    requireDisjoint(points, intervals)
    val pb = points.withColumn("__b", expr(bucketOf(pCol, bucketWidth)))
    val ib = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__b", explode(expr(
        s"sequence(${bucketOf(loCol, bucketWidth)}, " +
          s"((`$hiCol` - 1L - pmod(`$hiCol` - 1L, ${bucketWidth}L)) DIV ${bucketWidth}L))")))
    pb.join(ib, Seq("__b"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__b")
  }

  /** Join every a-row to every b-row whose half-open intervals
    * overlap: `aLo < bHi && bLo < aHi` (touching intervals do NOT
    * overlap). Each overlapping pair is emitted exactly once, from
    * the bucket containing max(aLo, bLo) — which both intervals
    * cover whenever they overlap.
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    requireDisjoint(a, b)
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(hi) > col(lo))
        .withColumn("__b", explode(expr(
          s"sequence(${bucketOf(lo, bucketWidth)}, " +
            s"((`$hi` - 1L - pmod(`$hi` - 1L, ${bucketWidth}L)) DIV ${bucketWidth}L))")))
    exploded(a, aLo, aHi).join(exploded(b, bLo, bHi), Seq("__b"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi) &&
        col("__b") === expr(
          s"((greatest(`$aLo`, `$bLo`) - pmod(greatest(`$aLo`, `$bLo`), ${bucketWidth}L)) " +
            s"DIV ${bucketWidth}L)"))
      .drop("__b")
  }
}
