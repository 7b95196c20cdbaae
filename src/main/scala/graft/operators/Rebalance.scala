package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan rebalancing for compute-dense per-row kernels (r16 — the
  * [[Similarity.bruteForceTopK]] rule generalized): operators whose
  * per-row work is heavy (winnowing, shingle/MinHash kernels, per-token
  * LM counting, per-window gram hashing) must take their parallelism
  * from the ROW count, not the input's byte size. A small parquet
  * corpus is one row group — one scan split — so without this the
  * kernel stage runs on one core while the rest idle (q193 measured
  * 9 s single-task at sf0.1; the sf10 sweep measured 800 M cosines in
  * ONE 845 s task). At real scale the scan already has ≥ cores splits
  * and this is a NO-OP — no exchange is added; when it does fire, the
  * one narrow exchange it adds is noise next to the kernel work it
  * parallelizes. Results are invariant: every consumer is keyed
  * aggregation/join work downstream.
  */
private[operators] object Rebalance {

  /** `df` repartitioned to the session's default parallelism iff it
    * currently has fewer partitions.
    */
  def toParallelism(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
