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
    val q1 = Scd2Sink.start(
      spark.readStream.schema(schema).parquet(srcDir),
      dimPath, s"$base/ckpt", "k", Seq("v"), clock = clock)
    q1.awaitTermination(60000)
    assert(q1.exception.isEmpty)
    val afterFirst = spark.read.parquet(dimPath).collect()
    assert(afterFirst.length === 2)
    assert(afterFirst.forall(_.getAs[Boolean]("is_current")))

    // batch 1: key 1 changes, key 3 is new
    Seq((1L, "a2"), (3L, "c")).toDF("k", "v")
      .write.mode("append").parquet(srcDir)
    val q2 = Scd2Sink.start(
      spark.readStream.schema(schema).parquet(srcDir),
      dimPath, s"$base/ckpt", "k", Seq("v"), clock = clock)
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

  test("orderCol picks the latest version when a batch has multiple rows per key") {
    val base = Files.createTempDirectory("scd2sink_ord").toString
    val rows = Seq((1L, "v1", ts("2024-01-01 10:00:00")),
      (1L, "v2", ts("2024-01-01 11:00:00")), // latest must win
      (1L, "v0", ts("2024-01-01 09:00:00")))
      .toDF("k", "v", "updated_at")
    rows.write.parquet(s"$base/src")
    val q = Scd2Sink.start(
      spark.readStream.schema(rows.schema).parquet(s"$base/src"),
      s"$base/dim", s"$base/ckpt", "k", Seq("v"), orderCol = Some("updated_at"),
      clock = _ => ts("2024-02-01 00:00:00"))
    q.awaitTermination(60000)
    assert(q.exception.isEmpty)
    val dim = spark.read.parquet(s"$base/dim").collect()
    assert(dim.length === 1)
    assert(dim.head.getAs[String]("v") === "v2")
  }

  test("reader falls back to the _prev directory after a crash mid-swap") {
    val base = Files.createTempDirectory("scd2sink_rec").toString
    val schema = Seq((1L, "a")).toDF("k", "v").schema
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$base/src")
    val q1 = Scd2Sink.start(
      spark.readStream.schema(schema).parquet(s"$base/src"),
      s"$base/dim", s"$base/ckpt", "k", Seq("v"),
      clock = _ => ts("2024-01-01 00:00:00"))
    q1.awaitTermination(60000)
    // simulate dying between the two renames: dim moved to _prev, new
    // output never arrived
    val fs = new org.apache.hadoop.fs.Path(s"$base/dim")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/dim"),
      new org.apache.hadoop.fs.Path(s"$base/dim_prev"))
    // replayed/next batch merges against _prev instead of first-loading
    Seq((1L, "a2")).toDF("k", "v").write.mode("append").parquet(s"$base/src")
    val q2 = Scd2Sink.start(
      spark.readStream.schema(schema).parquet(s"$base/src"),
      s"$base/dim", s"$base/ckpt", "k", Seq("v"),
      clock = _ => ts("2024-02-01 00:00:00"))
    q2.awaitTermination(60000)
    assert(q2.exception.isEmpty)
    val dim = spark.read.parquet(s"$base/dim").collect()
    // history survived: expired "a" + current "a2", not a fresh first load
    assert(dim.length === 2)
    assert(dim.count(_.getAs[Boolean]("is_current")) === 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/dim_prev")))
  }
}
