package graft.operators

import graft.SparkSpec

class RepeatedSpansSpec extends SparkSpec {

  import spark.implicits._

  private def spansOf(docs: Seq[(Long, String)], w: Int = 3): Seq[(Long, Long, Long)] =
    Dedup.repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("cross-document, within-document, and multi-span cases — hand computed") {
    // doc 1/3 share the run "b c d"; doc 2 repeats "x x x" WITHIN
    // itself (positions 1 and 2 → covered 1..4); doc 4 carries three
    // separate repeated runs (bcd with docs 1/3; "z z z" twice within
    // itself at positions 8 and 14) that must NOT merge across the
    // unique gaps.
    val spans = spansOf(Seq(
      (1L, "a b c d e f"),
      (2L, "x x x x"),
      (3L, "q b c d r"),
      (4L, "b c d m n o p z z z q r s z z z")))
    assert(spans === Seq(
      (1L, 2L, 3L),
      (2L, 1L, 4L),
      (3L, 2L, 3L),
      (4L, 1L, 3L), (4L, 8L, 3L), (4L, 14L, 3L)))
  }

  test("no repeats, short docs, and empty docs produce no spans") {
    assert(spansOf(Seq(
      (1L, "a b c d"),
      (2L, "e f"), // shorter than the window
      (3L, ""))).isEmpty)
  }

  test("touching repeats coarsen into one maximal run (windowed semantics)") {
    // "a b c" repeats (docs 5/6) and "c d e" repeats (docs 5/7); in
    // doc 5 their extents touch at position 3 → one merged run 1..5.
    val spans = spansOf(Seq(
      (5L, "a b c d e"),
      (6L, "a b c x y"),
      (7L, "z c d e w")))
    assert(spans === Seq(
      (5L, 1L, 5L),
      (6L, 1L, 3L),
      (7L, 2L, 3L)))
  }

  test("keep-first removal: earliest copy survives verbatim, later copies vanish") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x x x x"),
      (3L, "q b c d r"),
      (100L, "a b c d e f")) // verbatim copy of doc 1, later id
      .toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text", w = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((1L, "a b c d e f", 0L))) // first copy untouched
    assert(out(1) === ((2L, "x", 3L))) // within-doc repeat keeps pos 1
    assert(out(2) === ((3L, "q r", 3L))) // shared run removed, unique kept
    assert(out(3) === ((100L, "", 6L))) // later verbatim copy fully gone
  }

  test("loud require on a degenerate window") {
    intercept[IllegalArgumentException] {
      Dedup.repeatedSpans(Seq((1L, "a b")).toDF("doc_id", "text"),
        "doc_id", "text", w = 1)
    }
  }
}
