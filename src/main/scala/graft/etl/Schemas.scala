package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the inventory pipeline.
  *
  * Source of truth is the reference's Postgres DDL
  * (reference: src/main.py:10-28) and the CSV header
  * (reference: data/walmart_inventory_data.csv:1). We always pass an
  * explicit StructType instead of inferring — at 100 TB schema
  * inference means an extra full scan and nondeterministic typing.
  */
object Schemas {

  /** Wide source table, pre-staging types. */
  val inventory: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("date", TimestampType, nullable = true),
    StructField("store_id", StringType, nullable = true),
    StructField("store_location", StringType, nullable = true),
    StructField("product_id", StringType, nullable = true),
    StructField("product_category", StringType, nullable = true),
    StructField("quantity_sold", IntegerType, nullable = true),
    StructField("unit_price", DoubleType, nullable = true),
    StructField("total_sales", DoubleType, nullable = true),
    StructField("stock_level", IntegerType, nullable = true),
    StructField("reorder_point", IntegerType, nullable = true),
    StructField("lead_time_days", IntegerType, nullable = true),
    StructField("carrying_cost", DoubleType, nullable = true),
    StructField("stock_out_risk", DoubleType, nullable = true),
    StructField("inventory_turnover", DoubleType, nullable = true),
  ))

  /** The JSON variant carries `date` as epoch-millis int64
    * (reference: data/walmart_inventory_data.json) — ingest coerces via
    * timestamp_millis.
    */
  val inventoryJson: StructType = StructType(
    inventory.fields.map {
      case f if f.name == "date" => f.copy(dataType = LongType)
      case f => f
    })

  /** 1-row watermark metadata (reference: src/raw/raw_layer.py:37-38). */
  val watermark: StructType = StructType(Seq(
    StructField("last_processed", StringType, nullable = true)))
}
