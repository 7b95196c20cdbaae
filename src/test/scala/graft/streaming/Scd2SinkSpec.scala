package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class Scd2SinkSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming SCD2 sink: two batches build correct version history") {
    val base = Files.createTempDirectory("scd2sink").toString
    val srcDir = s"$base/src"
    val dimPath = s"$base/dim"
    val schema = Seq((1L, "a")).toDF("k", "v").schema
    val clock = (batchId: Long) => ts(s"2024-01-0${batchId + 1} 00:00:00")

    // batch 0: initial load
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("append").parquet(srcDir)
    val q1 = Scd2Sink.start(spark,
      spark.readStream.schema(schema).parquet(srcDir),
      dimPath, s"$base/ckpt", "k", Seq("v"), clock)
    q1.awaitTermination(60000)
    assert(q1.exception.isEmpty)
    val afterFirst = spark.read.parquet(dimPath).collect()
    assert(afterFirst.length === 2)
    assert(afterFirst.forall(_.getAs[Boolean]("is_current")))

    // batch 1: key 1 changes, key 3 is new
    Seq((1L, "a2"), (3L, "c")).toDF("k", "v")
      .write.mode("append").parquet(srcDir)
    val q2 = Scd2Sink.start(spark,
      spark.readStream.schema(schema).parquet(srcDir),
      dimPath, s"$base/ckpt", "k", Seq("v"), clock)
    q2.awaitTermination(60000)
    assert(q2.exception.isEmpty)

    val dim = spark.read.parquet(dimPath).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Boolean]("is_current"), Option(r.getAs[Timestamp]("end_date"))))
    // key 1: expired old version + new current
    val k1 = dim.filter(_._1 == 1L)
    assert(k1.length === 2)
    assert(k1.count(_._3) === 1)
    assert(k1.find(!_._3).get._4.isDefined) // expired has end_date
    assert(k1.find(_._3).get._2 === "a2")
    // key 2 untouched current; key 3 inserted current
    assert(dim.filter(_._1 == 2L).toSeq === Seq((2L, "b", true, None)))
    val k3 = dim.filter(_._1 == 3L)
    assert(k3.length === 1 && k3.head._3)
  }
}
