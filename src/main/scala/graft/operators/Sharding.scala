package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + shard assignment — the last step of
  * a training-data pipeline: give every document a pseudorandom but
  * reproducible position in the training order and cut the order into
  * `nShards` equal-count shards.
  *
  * The shuffle key is `md5(doc_id)` — content-independent, engine-
  * reproducible (identical hex in Spark and DuckDB, so the whole
  * assignment is oracle-checkable), and uniform, which is what makes
  * the rest distributed:
  *  - the global position is computed with the [[Ids]] split —
  *    (bucket offset + within-bucket rank) — generalized to string
  *    keys: hex-prefix buckets (`prefixLen` chars → 16^prefixLen
  *    buckets) are uniform BY CONSTRUCTION of the hash, the bucket
  *    count/prefix-sum frame is bucket-cardinality (broadcast back),
  *    and the per-bucket rank window is partition-parallel. No
  *    single-partition corpus window anywhere (the
  *    `row_number().over(Window.orderBy(...))` wall);
  *  - the shard cut is arithmetic, not data movement:
  *    `shard_id = global_idx · nShards DIV total` — shard sizes
  *    differ by at most one document, and a downstream writer
  *    `repartition(col("shard_id"))`s to produce the physical files;
  *  - per-document token counts ride along so [[shardBalance]] can
  *    audit what equal-COUNT sharding does to TOKEN balance (the
  *    number the training loop actually feeds on) — md5 uniformity
  *    makes token totals concentrate tightly, and the audit is the
  *    proof, not an assumption.
  *
  * Scale: one corpus scan; one shuffle keyed by the hex-prefix bucket
  * carrying (doc_id, 32-char hash, token count) — this op IS the
  * global shuffle, so that exchange is its contract; everything else
  * is bucket-cardinality.
  */
object Sharding {

  /** (doc_id, global_idx ∈ 0..n−1 dense in md5 order, shard_id,
    * n_tokens). `idCol` must be unique; ties are impossible after the
    * (hash, id) order key.
    */
  def shuffleShards(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, prefixLen: Int = 3): DataFrame = {
    require(nShards >= 1 && nShards <= (1 << 20),
      s"nShards=$nShards out of [1, 2^20]")
    require(prefixLen >= 1 && prefixLen <= 8,
      s"prefixLen=$prefixLen out of [1, 8]")
    val base = docs.select(col(idCol).as("doc_id"),
        md5(col(idCol).cast("string")).as("__h"),
        expr(s"size(filter(split(trim(`$textCol`), '\\\\s+'), x -> x != ''))")
          .cast("long").as("n_tokens"))
      .withColumn("__bucket", substring(col("__h"), 1, prefixLen))
    val counts = base.groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
    // bucket-cardinality frames: the single-partition window is over
    // 16^prefixLen rows, and the offsets broadcast back; the constant
    // partition key marks it intentional (and silences WindowExec's
    // "No Partition Defined" corpus-scale alarm — pmod(len(b),1) ≡ 0
    // but is not foldable, so EliminateWindowPartitions keeps it)
    val offsets = counts
      .withColumn("__offset",
        coalesce(
          sum(col("__n")).over(
            Window.partitionBy(pmod(length(col("__bucket")), lit(1)))
              .orderBy(col("__bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val total = counts.agg(sum(col("__n")).as("__c"))
    // hex-prefix-major ordering of __h equals full string ordering, so
    // offset + within-bucket rank is the dense global md5 rank
    val wIn = Window.partitionBy(col("__bucket"))
      .orderBy(col("__h"), col("doc_id"))
    base.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("global_idx",
        col("__offset") + row_number().over(wIn).cast("long") - 1L)
      .crossJoin(broadcast(total))
      .withColumn("shard_id",
        expr(s"CAST((global_idx * $nShards) DIV __c AS BIGINT)"))
      .select(col("doc_id"), col("global_idx"), col("shard_id"),
        col("n_tokens"))
  }

  /** Per-shard document and token totals — the balance audit. */
  def shardBalance(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
}
