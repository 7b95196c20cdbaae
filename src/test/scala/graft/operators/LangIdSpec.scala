package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LangIdSpec extends SparkSpec {

  import spark.implicits._

  test("profiles: rank by count desc then trigram text, capped at k") {
    // "aaab": trigrams aaa, aab; doubled text boosts aaa
    val labeled = Seq((1L, "xx", "aaaab")).toDF("doc_id", "lang", "text")
    val p = LangId.trainProfiles(labeled, "lang", "doc_id", "text", k = 2)
      .orderBy("rank").collect()
    assert(p.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq(("xx", "aaa", 1L), ("xx", "aab", 2L)))
  }

  test("out-of-place distance hand case: match, displaced, missing") {
    // "abcdabcdabc" → counts abc=3, bcd=2, cda=2, dab=2; k=2 profile
    // is [abc→1, bcd→2] (count desc, then trigram text).
    // doc "abcd": ranks abc=1, bcd=2 → dist 0.
    // doc "bcdx": ranks bcd=1, cdx=2 → |1−2| + k(missing cdx) = 5 at k=4.
    val labeled = Seq((1L, "en", "abcdabcdabc")).toDF("doc_id", "lang", "text")
    val profiles = LangId.trainProfiles(labeled, "lang", "doc_id", "text", k = 2)
    val docs = Seq((10L, "abcd"), (11L, "bcdx"), (12L, "zz")).toDF("doc_id", "text")
    val out = LangId.classify(docs, profiles, "doc_id", "text", docTopN = 4, k = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((10L, "en", 0L)))
    assert(out(1) === ((11L, "en", 5L)))
    assert(out(2) === ((12L, "und", -1L))) // too short for any trigram
  }

  test("classifies a two-language corpus correctly; ties break to smaller lang") {
    val mk = (lang: String, base: String, n: Int) =>
      (0 until n).map(i => (lang.hashCode.toLong * 1000 + i, lang, base * 4))
    val labeled = (mk("aa", "the cat sat ", 3) ++ mk("bb", "der hund lag ", 3))
      .toDF("doc_id", "lang", "text")
    val profiles = LangId.trainProfiles(labeled, "lang", "doc_id", "text", k = 32)
    val probe = Seq((1L, "the cat sat on the mat"), (2L, "der hund lag da"))
      .toDF("doc_id", "text")
    val out = LangId.classify(probe, profiles, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "aa", 2L -> "bb"))
    // identical profiles for two language codes → argmin ties to the
    // lexicographically smaller code
    val twin = LangId.trainProfiles(
      (mk("zz", "same text here ", 2) ++ mk("yy", "same text here ", 2))
        .toDF("doc_id", "lang", "text"),
      "lang", "doc_id", "text", k = 16)
    val tied = LangId.classify(Seq((5L, "same text here")).toDF("doc_id", "text"),
      twin, "doc_id", "text").collect()
    assert(tied(0).getString(1) === "yy")
  }

  test("partition invariance and loud requires") {
    val labeled = Seq((1L, "en", "hello world hello"), (2L, "fr", "bonjour le monde"))
      .toDF("doc_id", "lang", "text")
    val p1 = LangId.trainProfiles(labeled, "lang", "doc_id", "text", k = 8)
      .orderBy("lang", "rank").collect().toSeq
    val p2 = LangId.trainProfiles(labeled.repartition(7), "lang", "doc_id", "text", k = 8)
      .orderBy("lang", "rank").collect().toSeq
    assert(p1 === p2)
    intercept[IllegalArgumentException] {
      LangId.trainProfiles(labeled, "lang", "doc_id", "text", k = 0)
    }
  }
}
