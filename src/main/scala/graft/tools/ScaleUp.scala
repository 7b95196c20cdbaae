package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-factor multiplier for the driver testdata: writes an
  * `sfX = copies × sf0.1` dataset by unioning key-shifted copies of
  * every table, preserving referential integrity (copy i of orders
  * references copy i of customer/part/supplier, etc.). Dims
  * region/nation stay fixed, like TPC-H's scale-invariant tables.
  * Key spans round up to a multiple of 1000 so the catalog's
  * `key % 50/100`-style query-set selectors keep the same per-copy
  * selectivity. Content columns are copied verbatim — so the dedup
  * family sees every document with `copies−1` exact twins, which is
  * the boilerplate-heavy shape those operators are built for and a
  * deliberate stress of their bucket caps.
  *
  * EXACT TWINS ARE USELESS FOR ANN RECALL, though: every query's true
  * top-k is its own copies at cosine 1.0, which every quantizer also
  * ranks first, so recall reads trivially 1.0 at any scale (the r9
  * sweep trap). `--perturb-embeddings` fixes that for the embeddings
  * table: copy 0 stays byte-exact (catalog oracles that only read the
  * base span still hold) and copies i ≥ 1 blend each component with
  * deterministic hash noise — v' = (1−λ)·v + λ·u, λ = ¼,
  * u(vec_id, pos) ∈ [−1, 1] — giving an ORGANIC graded neighbor
  * structure (perturbed copies sit at cosine ≈ 0.9, not 1.0) while
  * keeping every |component| < 1 (the centroid-probe domain guard).
  * Ground truth stays computable by brute force, which is all a
  * recall measurement needs.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <copies> [--perturb-embeddings]
  * (local tooling only — the driver's own testdata is read-only).
  */
object ScaleUp {
  /** key columns to shift, per table: (table, ownKey, fk → spanOfTable) */
  private val shiftCols: Map[String, Seq[(String, String)]] = Map(
    "customer" -> Seq("c_custkey" -> "customer"),
    "supplier" -> Seq("s_suppkey" -> "supplier"),
    "part" -> Seq("p_partkey" -> "part"),
    "orders" -> Seq("o_orderkey" -> "orders", "o_custkey" -> "customer"),
    "lineitem" -> Seq("l_orderkey" -> "orders", "l_partkey" -> "part",
      "l_suppkey" -> "supplier"),
    "events" -> Seq("event_id" -> "events", "user_id" -> "events_user"),
    "documents" -> Seq("doc_id" -> "documents"),
    "embeddings" -> Seq("vec_id" -> "embeddings"))

  private def roundSpan(maxKey: Long): Long = ((maxKey / 1000L) + 1L) * 1000L

  /** Deterministic pseudo-noise in [−1, 1] from (id, pos) — no RNG, so
    * reruns regenerate the identical corpus.
    */
  private def hashNoise(id: Column, pos: Column): Column =
    pmod(xxhash64(id, pos), lit(2000001L)).cast("double") / 1000000.0 - 1.0

  /** Copy-i embeddings perturbed toward hash noise; copy 0 untouched.
    * Applied AFTER key shifting, so the noise is unique per output row.
    */
  private def perturbEmbedding(copyIdx: Column): Column =
    when(copyIdx === 0, col("embedding")).otherwise(
      transform(col("embedding"), (x, i) =>
        (x.cast("double") * lit(0.75) + lit(0.25) * hashNoise(col("vec_id"), i))
          .cast("float")))

  /** The organic scaled embeddings corpus as a reusable frame op —
    * what `--perturb-embeddings` writes, exposed so the recall-at-
    * scale spec gate and ad-hoc measurements build the IDENTICAL
    * corpus in memory: `copies` key-shifted copies (span `span`,
    * normally [[roundSpan]] of the source max key), copy 0 byte-exact,
    * copies ≥ 1 component-blended with deterministic hash noise.
    */
  def organicEmbeddings(e: DataFrame, copies: Int, span: Long): DataFrame = {
    val copyIdx = broadcast(e.sparkSession.range(copies).toDF("__i"))
    e.crossJoin(copyIdx)
      .withColumn("vec_id", col("vec_id") + col("__i") * span)
      .withColumn("embedding", perturbEmbedding(col("__i")))
      .drop("__i")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScaleUp <srcDir> <outDir> <copies> [--perturb-embeddings] [--only=t1,t2]")
    val Array(srcDir, outDir, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    require(copies >= 1, s"copies must be >= 1 (got $copies)")
    require(new java.io.File(srcDir).getCanonicalPath !=
        new java.io.File(outDir).getCanonicalPath,
      s"srcDir == outDir ($srcDir): mode(overwrite) would destroy the " +
        "source mid-read while copies are still computed from it")
    val perturb = args.drop(3).contains("--perturb-embeddings")
    val only: Option[Set[String]] = args.drop(3)
      .find(_.startsWith("--only=")).map(_.stripPrefix("--only=").split(",").toSet)
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("WARN")
    // spans from the SOURCE data, one tiny agg per keyed table
    def span(table: String, key: String): Long = {
      val row = Tables.load(spark, srcDir, table).agg(max(col(key))).head
      require(!row.isNullAt(0),
        s"ScaleUp: source table '$table' is empty — nothing to scale")
      roundSpan(row.getLong(0))
    }
    val spans: Map[String, Long] = Map(
      "customer" -> span("customer", "c_custkey"),
      "supplier" -> span("supplier", "s_suppkey"),
      "part" -> span("part", "p_partkey"),
      "orders" -> span("orders", "o_orderkey"),
      "events" -> span("events", "event_id"),
      "events_user" -> span("events", "user_id"),
      "documents" -> span("documents", "doc_id"),
      "embeddings" -> span("embeddings", "vec_id"))
    val copyIdx = broadcast(spark.range(copies).toDF("__i"))
    Tables.names.filter(t => only.forall(_.contains(t))).foreach { t =>
      val src = Tables.load(spark, srcDir, t)
      val out: DataFrame = shiftCols.get(t) match {
        case Some(_) if perturb && t == "embeddings" =>
          organicEmbeddings(src, copies, spans("embeddings"))
        case None => src // region/nation: scale-invariant dims
        case Some(cols) =>
          val crossed = src.crossJoin(copyIdx)
          val shifted = cols.foldLeft(crossed) { case (df, (c, spanKey)) =>
            df.withColumn(c, col(c) + col("__i") * spans(spanKey))
          }
          shifted.drop("__i")
      }
      // Scaled tables fan out across the core count on write: a single
      // output file at these sizes is a single parquet row group, and
      // every scan-side computation over it (tokenize, explode, decode,
      // cosine) then inherits ONE task no matter the byte-split config —
      // the first sf10 sweep's 52 MB single-file embeddings serialized
      // an 800 M-cosine stage onto one core. Dims (region/nation) and
      // 1× copies keep the source layout.
      val balanced =
        if (shiftCols.contains(t) && copies > 1)
          out.repartition(spark.sparkContext.defaultParallelism)
        else out
      balanced.write.mode("overwrite").parquet(Tables.path(outDir, t))
      println(s"[scaleup] $t -> ${Tables.path(outDir, t)}")
    }
    spark.stop()
  }
}
