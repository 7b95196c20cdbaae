package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min and signed-projection sketches: integer determinism,
  * the CMS overcount bound, merge-by-summing, and agreement with an
  * independent Scala reimplementation of the projection.
  */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private val keys: Seq[Long] =
    Seq.tabulate(400)(i => (i % 17).toLong) ++ Seq.fill(50)(99L)

  test("countMinEstimates: est >= exact for every key, equal when collision-free") {
    val df = keys.toDF("k")
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = Sketches.countMinEstimates(df, "k", depth = 4, width = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS under-counted key $k: ${est(k)} < $n")
    }
    // 18 distinct keys into 64 cells per row: at least ONE of the 4
    // rows should isolate the heavy key — but that's distribution luck,
    // so assert the structural fact instead: with width >= #keys the
    // estimate is exact iff no two keys share a cell in some row.
    val wide = Sketches.countMinEstimates(df, "k", depth = 4, width = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cells = Sketches.countMinCells(df, "k", depth = 4, width = 1024)
    val collisionFree = cells.groupBy("d").agg(count(lit(1)).as("n"))
      .collect().forall(_.getLong(1) == exact.size.toLong)
    if (collisionFree) exact.foreach { case (k, n) =>
      assert(wide(k) === n, s"collision-free CMS not exact for key $k")
    }
  }

  test("countMinCells: batch sketches merge by summing counters") {
    val (a, b) = keys.splitAt(200)
    val whole = Sketches.countMinCells(keys.toDF("k"), "k", 4, 64)
    val merged = Sketches.countMinCells(a.toDF("k"), "k", 4, 64)
      .unionByName(Sketches.countMinCells(b.toDF("k"), "k", 4, 64))
      .groupBy("d", "cell").agg(sum("cnt").as("cnt"))
    val w = whole.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m = merged.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(w === m, "sum-merged per-batch sketches must equal the whole-corpus sketch")
  }

  test("signedProjection matches an independent reimplementation") {
    val vecs = Seq(
      (1L, Array(1.0f, -1.0f, 0.25f, 0.999f)),
      (2L, Array(-0.5f, 0.0f, 0.75f, -0.25f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Sketches.signedProjection(df, "vec_id", "embedding", nPlanes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def q(x: Float): Long =
      math.max(-128L, math.min(127L, math.floor(x.toDouble * 127).toLong))
    def sign(pos: Int, plane: Int): Long =
      if (((pos * 3 + plane).toLong * 2654435761L / 65536L) % 2 == 0) 1L else -1L
    val want = (for {
      (id, v) <- vecs; plane <- 0 until 3
    } yield (id, plane.toLong) ->
      v.zipWithIndex.map { case (x, pos) => q(x) * sign(pos, plane) }.sum).toMap
    assert(got === want)
  }

  test("signedProjection: sign bit is not the alternating parity pattern") {
    // bit 16 of k*2654435761 must differ from plain parity of k
    // somewhere early, or the planes would be +1/-1 stripes
    val signs = (0 until 32).map(k =>
      ((k.toLong * 2654435761L / 65536L) % 2, (k % 2).toLong))
    assert(signs.exists { case (s, p) => s != p })
    assert(signs.map(_._1).distinct.size === 2, "both signs must occur")
  }

  test("bloom: no false negatives, prefiltered semi-join equals the plain semi-join") {
    val small = (1L to 40L).filter(_ % 7 == 0).toDF("k")
    val large = (1L to 2000L).map(i => (i % 200, i)).toDF("k", "v")
    val bits = Sketches.bloomBits(small, "k", nBits = 1024, k = 3)
    // every inserted key must pass its own filter
    val misses = small.filter(!Sketches.mightContain(col("k"), bits, 3)).count()
    assert(misses === 0L, "bloom filter dropped an inserted key (false negative)")
    val got = Sketches.bloomSemiJoin(large, "k", small, "k")
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = large.join(small, Seq("k"), "left_semi")
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("bloom: false-positive rate is low at the sized load factor") {
    val inserted = (0L until 100L).toDF("k")
    val bits = Sketches.bloomBits(inserted, "k", nBits = 4096, k = 3)
    // 100 keys * 3 bits in 4096 → theoretical FPR ~(1-e^-0.073)^3 ≈ 3e-4
    val probes = (10000L until 20000L).toDF("k") // disjoint from inserted
    val fp = probes.filter(Sketches.mightContain(col("k"), bits, 3)).count()
    assert(fp < 500L, s"false-positive rate implausibly high: $fp / 10000")
  }

  test("countMinCells on a stream: running cells equal the batch sketch (merge law)") {
    val dir = java.nio.file.Files.createTempDirectory("cms_stream").toString
    val (a, b) = keys.splitAt(200)
    a.toDF("k").coalesce(1).write.parquet(s"$dir/src")
    b.toDF("k").coalesce(1).write.mode("append").parquet(s"$dir/src")
    val stream = spark.readStream.schema("k LONG")
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/src")
    val q = Sketches.countMinCells(stream, "k", depth = 4, width = 64)
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(q.exception.isEmpty)
    val streamed = spark.sql("SELECT * FROM cms_cells")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketches.countMinCells(keys.toDF("k"), "k", 4, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch,
      "streaming cells after all batches must equal the batch sketch")
    spark.sql("DROP TABLE IF EXISTS cms_cells")
  }

  test("hllRegisters: registers merge across batches by elementwise max") {
    val a = (0L until 3000L).toDF("k")
    val b = (2000L until 6000L).toDF("k")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "k", p = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = (regs(a).keySet ++ regs(b).keySet).map { bk =>
      bk -> math.max(regs(a).getOrElse(bk, 0L), regs(b).getOrElse(bk, 0L))
    }.toMap
    val whole = regs(a.union(b))
    assert(whole === merged,
      "sketch of the union must equal the elementwise max of the sketches")
  }

  test("hllRegisters: partitioning-independent, estimate within HLL error") {
    val df = (0L until 50000L).filter(_ % 3 == 0).toDF("k") // 16667 distinct
    val r1 = Sketches.hllRegisters(df, "k", p = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = Sketches.hllRegisters(df.repartition(17), "k", p = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === r2, "registers must not depend on partitioning")
    val est = Sketches.hllEstimate(r1, p = 8)
    // standard error at m=256 is ~1.04/sqrt(m) ≈ 6.5%; allow 3 sigma
    assert(math.abs(est - 16667) / 16667.0 < 0.20, s"estimate too far off: $est")
    // duplicates must not move a distinct-count sketch at all
    val r3 = Sketches.hllRegisters(df.union(df), "k", p = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 === r1, "a distinct sketch must be duplicate-insensitive")
  }

  test("hllRegisters: state is bounded by 2^p rows and ranks stay in range") {
    val df = (0L until 100000L).toDF("k")
    val regs = Sketches.hllRegisters(df, "k", p = 4).collect()
    assert(regs.length <= 16, "register count must be bounded by 2^p")
    // width = 31 - 4 = 27 → rank ∈ [1, 28]
    assert(regs.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 28))
    intercept[IllegalArgumentException](Sketches.hllRegisters(df, "k", p = 3))
    intercept[IllegalArgumentException](Sketches.hllRegisters(df, "k", p = 17))
  }

  test("countMin rejects bad shapes") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException](Sketches.countMinCells(df, "k", 0, 64))
    intercept[IllegalArgumentException](Sketches.countMinCells(df, "k", 5, 64))
    intercept[IllegalArgumentException](Sketches.countMinCells(df, "k", 4, 1))
    intercept[IllegalArgumentException](
      Sketches.signedProjection(df.withColumn("v", array(lit(1.0f))), "k", "v", 0))
  }
}
