package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // Crafted to cover: boundary inclusivity (p == lo in, p == hi out),
  // intervals spanning several buckets, an empty interval, negative
  // values (floor-div correctness), and duplicate-free emission for
  // intervals that share many buckets.
  private val points = Seq(
    (1L, -7L), (2L, -5L), (3L, 0L), (4L, 3L), (5L, 5L),
    (6L, 9L), (7L, 10L), (8L, 17L), (9L, 23L), (10L, 40L)
  ).toDF("pid", "p")

  private val intervals = Seq(
    (100L, -10L, 0L),  // pure-negative range
    (101L, -5L, 6L),   // crosses zero, spans 3+ buckets at w=5
    (102L, 5L, 10L),   // half-open: 5 in, 10 out
    (103L, 8L, 8L),    // empty — matches nothing
    (104L, 0L, 25L)    // long interval, many buckets
  ).toDF("iid", "lo", "hi")

  private def brutePoint(w: Long): Set[(Long, Long)] =
    points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pointInInterval matches the brute-force inequality join at several widths") {
    for (w <- Seq(1L, 3L, 5L, 100L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicate pairs at w=$w")
      assert(got.toSet === brutePoint(w), s"pair set diverged at w=$w")
    }
  }

  test("pointInInterval boundary semantics: lo inclusive, hi exclusive, empty interval dead") {
    val pairs = brutePoint(5L)
    assert(pairs.contains((5L, 102L)), "p=5 == lo must match [5,10)")
    assert(!pairs.contains((7L, 102L)), "p=10 == hi must not match [5,10)")
    assert(!pairs.exists(_._2 == 103L), "empty interval [8,8) matches nothing")
    assert(pairs.contains((2L, 100L)) && pairs.contains((2L, 101L)),
      "negative point joins negative and zero-crossing ranges")
  }

  private val as = Seq(
    (1L, -6L, -1L), (2L, 0L, 7L), (3L, 5L, 20L), (4L, 30L, 31L)
  ).toDF("aid", "alo", "ahi")
  private val bs = Seq(
    (10L, -3L, 2L), (11L, 7L, 9L), (12L, 19L, 30L), (13L, 31L, 40L), (14L, 2L, 2L)
  ).toDF("bid", "blo", "bhi")

  // the bare inequality test alone wrongly says the EMPTY interval
  // [2,2) overlaps [0,7) — half-open overlap is only meaningful for
  // non-empty intervals, so the reference excludes them like the
  // operator does
  private def bruteOverlap: Set[(Long, Long)] =
    as.join(bs, $"alo" < $"bhi" && $"blo" < $"ahi" &&
        $"ahi" > $"alo" && $"bhi" > $"blo")
      .select($"aid", $"bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("intervalOverlap matches brute force, emits each pair once, touching ranges excluded") {
    val expected = bruteOverlap
    // sanity on the crafted facts themselves
    assert(!expected.contains((2L, 11L)), "[0,7) and [7,9) touch but do not overlap")
    assert(!expected.contains((4L, 13L)), "[30,31) and [31,40) touch but do not overlap")
    assert(expected.contains((3L, 12L)), "[5,20) and [19,30) overlap on [19,20)")
    assert(!expected.exists(_._2 == 14L), "empty b-interval overlaps nothing")
    for (w <- Seq(1L, 4L, 7L, 50L)) {
      val got = RangeJoin.intervalOverlap(as, "alo", "ahi", bs, "blo", "bhi", w)
        .select($"aid", $"bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size,
        s"pair emitted from more than one shared bucket at w=$w")
      assert(got.toSet === expected, s"overlap set diverged at w=$w")
    }
  }

  test("disjoint-column and positive-width contracts are enforced loudly") {
    val clash = Seq((1L, 2L)).toDF("pid", "lo")
    assertThrows[IllegalArgumentException] {
      RangeJoin.pointInInterval(clash, "pid", intervals.withColumnRenamed("iid", "pid"),
        "lo", "hi", 5L)
    }
    assertThrows[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 0L)
    }
  }
}
