package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the greatest right time ≤ left time, null before first") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (1L, ts("2024-01-01 09:00:00"), "e0"), // before any right row
      (2L, ts("2024-01-01 11:00:00"), "e3"),
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100.0),
      (1L, ts("2024-01-01 11:30:00"), 200.0),
      (2L, ts("2024-01-01 11:00:00"), 300.0), // equal ts → inclusive
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .select("name", "asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("e0") === None)
    assert(out("e1") === Some(100.0))
    assert(out("e2") === Some(200.0))
    assert(out("e3") === Some(300.0)) // ≥ semantics: same-instant row matches
  }

  test("asofJoin tolerance masks stale matches to null, keeps fresh and boundary ones") {
    import org.apache.spark.sql.functions.expr
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"),    // match 30 min old → kept
      (1L, ts("2024-01-01 12:00:00"), "boundary"), // match exactly 1 h old → kept (≥)
      (1L, ts("2024-01-01 14:00:00"), "stale"),    // match 3 h old → masked
      (2L, ts("2024-01-01 11:00:00"), "none"),     // no match at all → null either way
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 200.0),
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "t", Seq("v"),
        tolerance = Some(expr("INTERVAL 1 HOUR")))
      .select("name", "asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("fresh") === Some(100.0))
    assert(out("boundary") === Some(200.0), "t - tolerance == match time is NOT stale")
    assert(out("stale") === None, "match older than tolerance masks to null")
    assert(out("none") === None)
  }

  test("scd2Lookup resolves each fact to the dim version valid at fact time") {
    val dim = Seq(
      // key 1: v=old until 2024-01-01, then v=new
      (1L, "old", ts("2023-01-01 00:00:00"), Some(ts("2024-01-01 00:00:00")), false),
      (1L, "new", ts("2024-01-01 00:00:00"), Option.empty[Timestamp], true),
      // key 2: expired with no successor (deleted key)
      (2L, "gone", ts("2023-01-01 00:00:00"), Some(ts("2023-06-01 00:00:00")), false),
    ).toDF("k", "attr", "start_date", "end_date", "is_current")
    val facts = Seq(
      (1L, ts("2023-07-01 00:00:00"), "f_mid"),   // → old
      (1L, ts("2024-05-01 00:00:00"), "f_late"),  // → new
      (1L, ts("2022-01-01 00:00:00"), "f_early"), // → before history: null
      (2L, ts("2023-08-01 00:00:00"), "f_gone"),  // → version expired: null
    ).toDF("k", "t", "name")
    val out = AsOfJoin.scd2Lookup(facts, dim, "k", "t", Seq("attr"))
      .select("name", "dim_attr").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("f_mid") === Some("old"))
    assert(out("f_late") === Some("new"))
    assert(out("f_early") === None)
    assert(out("f_gone") === None)
  }

  test("asofJoin accepts valueCols in a different order than the right schema") {
    val left = Seq((1L, ts("2024-01-02 00:00:00"), "e")).toDF("k", "t", "name")
    // right schema order: (k, t, a, b); carried as Seq(b, a) — reversed
    val right = Seq((1L, ts("2024-01-01 00:00:00"), "va", 7.5))
      .toDF("k", "t", "a", "b")
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "t", Seq("b", "a")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("asof_b") === 7.5)
    assert(out.head.getAs[String]("asof_a") === "va")
  }
}
