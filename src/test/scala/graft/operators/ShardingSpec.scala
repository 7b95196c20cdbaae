package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardingSpec extends SparkSpec {

  import spark.implicits._

  private def docs(n: Int) =
    (0L until n.toLong).map(i => (i, s"tok$i tok${i + 1} tok${i + 2}"))
      .toDF("doc_id", "text")

  test("global_idx is the dense md5 rank (bucketed ≡ single-sort reference)") {
    val d = docs(500)
    val got = Sharding.shuffleShards(d, "doc_id", "text", nShards = 4)
      .select("doc_id", "global_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = d.select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .orderBy("h", "doc_id").collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(got === ref)
  }

  test("equal-count shards: sizes differ by at most one; ids dense per shard") {
    val a = Sharding.shuffleShards(docs(1003), "doc_id", "text", nShards = 8)
    val sizes = a.groupBy("shard_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === (0L until 8L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    // shard_id is monotone in global_idx (contiguous cuts)
    val rows = a.orderBy("global_idx").select("shard_id").collect().map(_.getLong(0))
    assert(rows.sameElements(rows.sorted))
  }

  test("assignment is partition-count invariant and reproducible") {
    val d = docs(300)
    val a = Sharding.shuffleShards(d, "doc_id", "text", nShards = 5)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Sharding.shuffleShards(d.repartition(13), "doc_id", "text", nShards = 5)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b))
  }

  test("token counts ride along; balance audit totals match the corpus") {
    val d = Seq((1L, "a b c"), (2L, ""), (3L, "  x  ")).toDF("doc_id", "text")
    val a = Sharding.shuffleShards(d, "doc_id", "text", nShards = 2)
    val toks = a.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(toks === Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
    val bal = Sharding.shardBalance(a).collect()
    assert(bal.map(_.getLong(1)).sum === 3L)
    assert(bal.map(_.getLong(2)).sum === 4L)
  }

  test("nShards = 1 puts everything in shard 0; loud require on bounds") {
    val a = Sharding.shuffleShards(docs(20), "doc_id", "text", nShards = 1)
    assert(a.select("shard_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(0L))
    intercept[IllegalArgumentException] {
      Sharding.shuffleShards(docs(5), "doc_id", "text", nShards = 0)
    }
  }
}
