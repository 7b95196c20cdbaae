package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-first orchestration of the medallion pipeline: source → raw →
  * staging → curated → temp views for serving
  * (reference: src/main.py + the three layer modules, minus the
  * poll-forever loop — scheduling is the caller's concern; a
  * Structured Streaming variant lives in graft.streaming).
  *
  * Unlike the reference (which re-reads the staging scan 8×), the
  * staging DataFrame is cached once and all four curated outputs build
  * from it.
  */
object Pipeline {

  /** `staging` is exposed so a long-lived orchestrator can
    * `staging.unpersist()` once the four outputs are materialized —
    * otherwise each runBatch call pins another cached RDD for the
    * session's lifetime.
    */
  final case class CuratedOutputs(
      dimDate: DataFrame,
      dimStore: DataFrame,
      dimProduct: DataFrame,
      factSales: DataFrame,
      staging: DataFrame)

  /** Build all curated outputs from a raw DataFrame in one pass.
    *
    * @param cacheStaging cache the cleaned staging frame — right when
    *   all four outputs are materialized (the reference re-scanned the
    *   staging zone 8×); skip it when only one output is consumed, the
    *   materialization then costs more than the recompute.
    */
  def runBatch(
      raw: DataFrame,
      existingStore: Option[DataFrame] = None,
      existingProduct: Option[DataFrame] = None,
      asOf: Timestamp = Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")),
      referenceSemantics: Boolean = true,
      cacheStaging: Boolean = true,
      // the 100 TB posture flag, threaded to StagingLayer.clean: the
      // parity default full-row dropDuplicates shuffles every wide
      // column; hashDedup=true shuffles one md5 key instead (result
      // equal up to 2^-128 — see StagingLayer.clean). Measured A/B at
      // sf10 in SCALING.md "r14 at the 100× point".
      hashDedup: Boolean = false): CuratedOutputs = {
    val cleaned = StagingLayer.clean(raw, hashDedup = hashDedup)
    val staging = if (cacheStaging) cleaned.cache() else cleaned
    CuratedOutputs(
      dimDate = CuratedLayer.dimDate(staging),
      dimStore = CuratedLayer.dimStore(staging, existingStore, asOf, referenceSemantics),
      dimProduct = CuratedLayer.dimProduct(staging, existingProduct, asOf, referenceSemantics),
      factSales = CuratedLayer.factSales(staging),
      staging = staging)
  }

  /** Register the star schema for Spark-SQL serving (dashboard parity). */
  def registerViews(spark: SparkSession, out: CuratedOutputs): Unit = {
    out.dimDate.createOrReplaceTempView("dim_date")
    out.dimStore.createOrReplaceTempView("dim_store")
    out.dimProduct.createOrReplaceTempView("dim_product")
    out.factSales.createOrReplaceTempView("fact_sales")
  }
}
