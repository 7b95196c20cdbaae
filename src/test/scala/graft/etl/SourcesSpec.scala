package graft.etl

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("CSV source reads with the explicit inventory schema") {
    val dir = Files.createTempDirectory("src_csv").toString
    val csv = s"""transaction_id,date,store_id,store_location,product_id,product_category,quantity_sold,unit_price,total_sales,stock_level,reorder_point,lead_time_days,carrying_cost,stock_out_risk,inventory_turnover
                 |TXN1,2023-01-01 00:00:00,ST1,NYC,P1,Toys,2,10.0,20.0,5,10,3,1.0,0.1,2.0
                 |TXN2,2023-02-01 00:00:00,ST2,LA,P2,Food,1,5.0,5.0,8,4,2,0.5,0.2,1.0""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"), csv)
    val df = Sources.read(spark, Sources.CsvSource(s"$dir/data.csv", Schemas.inventory))
    assert(df.count() === 2)
    // file scans relax nullability — compare names and types
    assert(df.schema.map(f => f.name -> f.dataType) ===
      Schemas.inventory.map(f => f.name -> f.dataType))
    assert(df.filter($"transaction_id" === "TXN1").head.getTimestamp(1) === ts("2023-01-01"))
  }

  test("JSON source coerces epoch-millis date to timestamp") {
    val dir = Files.createTempDirectory("src_json").toString
    // 2023-01-01T00:00:00Z = 1672531200000 ms
    val json =
      """{"transaction_id":"TXN1","date":1672531200000,"store_id":"ST1","store_location":"NYC","product_id":"P1","product_category":"Toys","quantity_sold":2,"unit_price":10.0,"total_sales":20.0,"stock_level":5,"reorder_point":10,"lead_time_days":3,"carrying_cost":1.0,"stock_out_risk":0.1,"inventory_turnover":2.0}"""
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"), json)
    val df = Sources.read(spark, Sources.JsonSource(s"$dir/data.json", Schemas.inventoryJson))
    assert(df.head.getAs[Timestamp]("date") === ts("2023-01-01"))
  }

  test("incremental file source filters past the watermark") {
    val dir = Files.createTempDirectory("src_inc").toString
    Seq(("a", ts("2023-01-01")), ("b", ts("2023-03-01")))
      .toDF("id", "date").write.parquet(s"$dir/p")
    val src = Sources.incremental(spark, Sources.ParquetSource(s"$dir/p"), "date")
    assert(src(None).count() === 2)
    val inc = src(Some("2023-02-01")).collect()
    assert(inc.length === 1 && inc.head.getString(0) === "b")
  }

  test("mergeSchema parquet source reconciles batches across a schema change") {
    val dir = Files.createTempDirectory("src_merge").toString
    Seq(("a", 1L)).toDF("id", "v").write.parquet(s"$dir/p/b1")
    Seq(("b", 2L, "en")).toDF("id", "v", "lang").write.parquet(s"$dir/p/b2")
    val merged = Sources.read(spark,
      Sources.ParquetSource(s"$dir/p/*", mergeSchema = Some(true)))
    assert(merged.columns.toSet === Set("id", "v", "lang"))
    val byId = merged.collect().map(r => r.getString(0) -> r.getAs[String]("lang")).toMap
    assert(byId("a") === null && byId("b") === "en",
      "pre-change rows must surface null for the added column")
  }

  test("incremental JDBC source embeds the watermark predicate in the pushed query") {
    val src = Sources.JdbcSource("jdbc:postgresql://db/x", "SELECT * FROM inventory")
    // build only — no database in CI; assert the query text is rewritten
    val rewritten = src.copy(
      query = s"SELECT * FROM (${src.query}) s WHERE date > '2023-02-01'")
    assert(rewritten.query.contains("WHERE date > '2023-02-01'"))
  }

  test("readCsvQuarantined: clean rows flow, malformed lines land whole in the dead-letter lane") {
    val dir = Files.createTempDirectory("src_quar").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      """id,qty,day
        |1,5,2023-01-01
        |2,not_a_number,2023-01-02
        |3,7,2023-01-03
        |4,8
        |""".stripMargin)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("qty", "long").add("day", "string")
    val (clean, quarantined) = Sources.readCsvQuarantined(spark, s"$dir/in.csv", schema)
    assert(clean.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 3L),
      "rows 2 (bad long) and 4 (missing column) must not reach the clean lane")
    val bad = quarantined.collect()
    assert(bad.length === 2)
    // the raw line is preserved byte-for-byte for replay
    assert(bad.map(_.getAs[String]("raw_line")).toSet ===
      Set("2,not_a_number,2023-01-02", "4,8"))
    // schema contract: caller must not pre-declare the corrupt column
    intercept[IllegalArgumentException] {
      Sources.readCsvQuarantined(spark, s"$dir/in.csv",
        schema.add("_corrupt_record", "string"))
    }
  }

  test("quarantineCsvLines works unchanged on a STREAMING text source") {
    val dir = Files.createTempDirectory("src_squar").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/batch1.txt"),
      """1,5
        |2,oops
        |3,7
        |""".stripMargin)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("qty", "long")
    val lines = spark.readStream.text(s"$dir/in").toDF("raw_line")
    assert(lines.isStreaming)
    val (clean, quarantined) = Sources.quarantineCsvLines(lines, schema)
    val q1 = clean.writeStream.format("memory").queryName("sq_clean")
      .option("checkpointLocation", s"$dir/ck1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q1.awaitTermination(60000)
    val q2 = quarantined.writeStream.format("memory").queryName("sq_dlq")
      .option("checkpointLocation", s"$dir/ck2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.table("sq_clean").select("id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(spark.table("sq_dlq").select("raw_line").collect()
      .map(_.getString(0)).toSeq === Seq("2,oops"))
  }

  test("readJsonQuarantined: NDJSON split mirrors the CSV lane semantics") {
    val dir = Files.createTempDirectory("src_jquar").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"id": 1, "qty": 5}
        |{"id": 2, "qty": "not_a_number"}
        |not json at all
        |{"id": 4, "qty": 8}
        |""".stripMargin)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("qty", "long")
    val (clean, quarantined) = Sources.readJsonQuarantined(spark, s"$dir/in.json", schema)
    assert(clean.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 4L))
    assert(quarantined.collect().map(_.getAs[String]("raw_line")).toSet ===
      Set("""{"id": 2, "qty": "not_a_number"}""", "not json at all"))
  }

  test("conformSchema: reorders, widens, nulls missing optionals, fails loudly on loss") {
    val target = new org.apache.spark.sql.types.StructType()
      .add("id", "long", nullable = false)
      .add("qty", "long")
      .add("note", "string") // nullable, absent from input → typed null
    val in = Seq((5, "x", 9L)).toDF("qty", "junk", "id") // wrong order, qty int, extra col
    val out = Sources.conformSchema(in, target)
    assert(out.columns.toSeq === Seq("id", "qty", "note"))
    assert(out.schema("qty").dataType.typeName === "long", "int must widen to long")
    val row = out.head()
    assert((row.getLong(0), row.getLong(1), row.isNullAt(2)) === ((9L, 5L, true)))
    // narrowing fails fast with the violation named
    val narrow = new org.apache.spark.sql.types.StructType().add("id", "integer")
    val ex = intercept[IllegalArgumentException](Sources.conformSchema(in, narrow))
    assert(ex.getMessage.contains("does not widen"))
    // missing REQUIRED column fails fast
    val required = new org.apache.spark.sql.types.StructType()
      .add("absent", "string", nullable = false)
    val ex2 = intercept[IllegalArgumentException](Sources.conformSchema(in, required))
    assert(ex2.getMessage.contains("missing"))
  }

  test("conformSchema: case-insensitive resolution, dotted names, null guard on required") {
    // Case-mismatched input column must MATCH (Spark's default resolver
    // is case-insensitive), not silently become a typed-null column.
    val target = new org.apache.spark.sql.types.StructType()
      .add("qty", "long")
    val caseIn = Seq(7).toDF("Qty")
    assert(Sources.conformSchema(caseIn, target).head().getLong(0) === 7L)
    // Two inputs colliding case-insensitively on one target name: error.
    val ambig = Seq((1, 2)).toDF("qty", "QTY")
    val exA = intercept[IllegalArgumentException](Sources.conformSchema(ambig, target))
    assert(exA.getMessage.contains("ambiguous"))
    // Dotted column names resolve verbatim, never as struct paths.
    val dotted = Seq(1.5).toDF("geo.lat")
    val dotTarget = new org.apache.spark.sql.types.StructType().add("geo.lat", "double")
    assert(Sources.conformSchema(dotted, dotTarget).head().getDouble(0) === 1.5)
    // Null flowing into a non-nullable target column aborts at action time.
    val reqTarget = new org.apache.spark.sql.types.StructType()
      .add("id", "long", nullable = false)
    val withNull = Seq[Option[Long]](Some(1L), None).toDF("id")
    val exN = intercept[Exception](Sources.conformSchema(withNull, reqTarget).collect())
    assert(exN.getMessage.contains("null in required column 'id'"))
    // ...and the guard passes clean data through untouched.
    val clean = Seq[Option[Long]](Some(3L)).toDF("id")
    assert(Sources.conformSchema(clean, reqTarget).head().getLong(0) === 3L)
  }

  test("conformSchema: honors spark.sql.caseSensitive=true") {
    val target = new org.apache.spark.sql.types.StructType()
      .add("qty", "long")
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      // 'Qty' no longer matches 'qty': nullable target → typed null...
      val out = Sources.conformSchema(Seq(7).toDF("Qty"), target)
      assert(out.head().isNullAt(0))
      // ...and a required target column fails fast as missing.
      val required = new org.apache.spark.sql.types.StructType()
        .add("qty", "long", nullable = false)
      val ex = intercept[IllegalArgumentException](
        Sources.conformSchema(Seq(7).toDF("Qty"), required))
      assert(ex.getMessage.contains("missing"))
      // ...while case-colliding input columns are no longer ambiguous.
      assert(Sources.conformSchema(Seq((1, 2)).toDF("qty", "QTY"), target)
        .head().getLong(0) === 1L)
    } finally spark.conf.set("spark.sql.caseSensitive", "false")
  }

  test("partitioned parquet sink round-trips with partition pruning") {
    val dir = Files.createTempDirectory("src_sink").toString
    val df = Seq(("a", "2023-01-01"), ("b", "2023-02-01")).toDF("id", "day")
    Sources.write(df, Sources.ParquetSink(s"$dir/out", Seq("day")))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() === 2)
    assert(back.where($"day" === "2023-02-01").count() === 1)
  }
}
