package graft.operators

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  test("chunkByChars: zero-overlap chunks reassemble to the original text") {
    val text = ('a' to 'z').mkString * 10 // 260 chars
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.chunkByChars(d, "doc_id", "text", maxLen = 100)
      .orderBy("chunk_id").collect()
    assert(chunks.length === 3)
    assert(chunks.map(_.getString(2)).mkString === text)
    assert(chunks.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
  }

  test("chunkByChars: overlapping windows share the overlap region") {
    val text = "0123456789" * 5 // 50 chars
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.chunkByChars(d, "doc_id", "text", maxLen = 20, overlap = 5)
      .orderBy("chunk_id").collect().map(_.getString(2))
    // stride 15: starts at 0, 15, 30 — a 4th chunk at 45 would be
    // pure overlap of chunk 2 (chars 46-50 ⊂ 31-50) and is not emitted
    assert(chunks.length === 3)
    assert(chunks(0).takeRight(5) === chunks(1).take(5))
    assert(chunks(2) === text.substring(30)) // still covers to the end
    // empty docs emit nothing
    assert(Chunking.chunkByChars(Seq((2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", 20).count() === 0)
  }

  test("chunkByChars: a doc exactly maxLen long is one chunk, not two") {
    val text = "x" * 500
    val chunks = Chunking.chunkByChars(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", maxLen = 500, overlap = 50).collect()
    assert(chunks.length === 1)
    assert(chunks.head.getString(2) === text)
  }

  test("chunkByTokens: bounded token windows with overlap") {
    val text = (1 to 25).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.chunkByTokens(d, "doc_id", "text", maxTokens = 10, overlap = 2)
      .orderBy("chunk_id").collect()
    // stride 8: starts at tokens 0, 8, 16 — a 4th at 24 would add no
    // tokens beyond chunk 2's tail overlap
    assert(chunks.length === 3)
    assert(chunks.map(_.getAs[Int]("n_tokens")).toSeq === Seq(10, 10, 9))
    assert(chunks(0).getString(2).split(" ").last === "w10")
    assert(chunks(1).getString(2).split(" ").head === "w9") // 2-token overlap
    assert(chunks(2).getString(2).split(" ").last === "w25") // full coverage
  }

  test("flagContaminated: docs containing a benchmark 13-gram are flagged") {
    val bench = Seq(
      (100L, (1 to 20).map(i => s"q$i").mkString(" "))) // benchmark question
      .toDF("bid", "text")
    val corpus = Seq(
      (1L, "prefix words " + (1 to 20).map(i => s"q$i").mkString(" ") + " trailing"),
      (2L, (1 to 12).map(i => s"q$i").mkString(" ")), // only 12 tokens — below n
      (3L, "completely unrelated document with plenty of its own tokens here"),
    ).toDF("doc_id", "text")
    val flagged = Chunking.flagContaminated(corpus, bench, "doc_id", "text", n = 13)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(1L) && flagged(1L) === 8L) // 20-13+1 matching grams
    assert(!flagged.contains(2L))
    assert(!flagged.contains(3L))
  }

  test("packSequences: concat-and-split coordinates, per-group streams") {
    val docs = Seq(
      (1L, "a", 600L), (2L, "a", 600L), (3L, "a", 600L), (4L, "a", 600L),
      (10L, "b", 2500L), (11L, "b", 100L)).toDF("doc_id", "source", "n_tokens")
    val packed = Chunking.packSequences(docs, "doc_id", "n_tokens", "source",
        budget = 1000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // group a: cumulative-before = 0, 600, 1200, 1800
    assert(packed(1L) === (0L, 0L))
    assert(packed(2L) === (0L, 600L))
    assert(packed(3L) === (1L, 200L)) // spans the pack-1 boundary
    assert(packed(4L) === (1L, 800L))
    // group b starts its own stream; a 2500-token doc spans packs 0-2
    assert(packed(10L) === (0L, 0L))
    assert(packed(11L) === (2L, 500L))
  }

  test("sftFormat: mask_from aligns with rendered-string tokens, even on mid-word cuts") {
    val docs = Seq(
      // promptChars=10 cuts 'alpha beta gamma' mid-word: body 'alpha beta', completion ' gamma...'? no:
      // chars 1-10 = "alpha beta"(10) -> completion starts at 'a'? text below chosen so the cut IS mid-word
      (1L, "alphabetagamma delta epsilon zeta"),   // cut inside 'alphabetagamma'
      (2L, "two words only"),                      // shorter completion
      (3L, "tiny")                                 // shorter than promptChars -> empty completion
    ).toDF("doc_id", "text")
    val out = Chunking.sftFormat(docs, "doc_id", "text",
        instruction = "Continue: ", promptChars = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    out.foreach { case (id, (rendered, nPrompt, nCompl, maskFrom)) =>
      val total = rendered.trim.split("\\s+").count(_.nonEmpty)
      assert(maskFrom === nPrompt)
      assert(total === nPrompt + nCompl,
        s"doc $id: tokens(rendered)=$total != $nPrompt + $nCompl — mask misaligned: '$rendered'")
    }
    // the boundary invariant holds exactly where the old template broke:
    // a mid-word cut must not merge prompt tail with completion head
    assert(out(1L)._1.contains(" <|assistant|> "))
    assert(out(3L)._3 === 0L, "doc shorter than promptChars -> empty completion")
  }
}
