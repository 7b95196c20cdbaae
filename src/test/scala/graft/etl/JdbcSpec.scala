package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value-verification of the JDBC source/sink (SURVEY §2 S1/S5) against
  * a REAL embedded database: DuckDB over its JDBC driver, test-scope
  * only (picked up unmanaged from the local artifact cache — the specs
  * cancel, not fail, when the jar is absent). This closes the gap the
  * round-1 review flagged: the JDBC paths were compile-tested and
  * query-rewrite-spec'd but never executed against a live database.
  */
class JdbcSpec extends SparkSpec {

  import spark.implicits._

  private val driverAvailable =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: Throwable => false }

  private val props = Map("driver" -> "org.duckdb.DuckDBDriver")

  private def withDb(test: (String, java.sql.Connection) => Unit): Unit = {
    assume(driverAvailable, "duckdb_jdbc driver jar not on the test classpath")
    val dir = Files.createTempDirectory("graft_jdbc")
    val url = s"jdbc:duckdb:$dir/db"
    val conn = java.sql.DriverManager.getConnection(url)
    try test(url, conn)
    finally conn.close()
  }

  test("S1: JDBC source reads a live embedded database") {
    withDb { (url, conn) =>
      val st = conn.createStatement()
      st.execute("CREATE TABLE inv (id BIGINT, name VARCHAR, date TIMESTAMP)")
      st.execute("""INSERT INTO inv VALUES
        (1, 'a', TIMESTAMP '2024-01-01 00:00:00'),
        (2, 'b', TIMESTAMP '2024-01-03 00:00:00')""")
      val df = Sources.read(spark, Sources.JdbcSource(url, "SELECT * FROM inv", props))
      // DuckDB's JDBC metadata surfaces BIGINT as DECIMAL(38,0) to
      // Spark — value comparison goes through an explicit cast
      val rows = df.select(col("id").cast("long"), col("name")).orderBy("id").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
      assert(rows.map(_.getString(1)).toSeq === Seq("a", "b"))
    }
  }

  test("P4: watermark predicate is pushed into the database subquery") {
    withDb { (url, conn) =>
      val st = conn.createStatement()
      st.execute("CREATE TABLE inv (id BIGINT, date TIMESTAMP)")
      st.execute("""INSERT INTO inv VALUES
        (1, TIMESTAMP '2024-01-01 00:00:00'),
        (2, TIMESTAMP '2024-01-03 00:00:00'),
        (3, TIMESTAMP '2024-01-05 00:00:00')""")
      val src = Sources.incremental(spark,
        Sources.JdbcSource(url, "SELECT * FROM inv", props), "date")
      // no watermark → full extract; with watermark → the database
      // evaluates `date > w` inside the rewritten subquery
      assert(src(None).count() === 3)
      val inc = src(Some("2024-01-02")).select(col("id").cast("long"))
        .orderBy("id").collect()
      assert(inc.map(_.getLong(0)).toSeq === Seq(2L, 3L))
    }
  }

  test("S5: JDBC sink writes and a source round-trips the same rows") {
    withDb { (url, conn) =>
      val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "name", "score")
      // Spark's tableExists probe can't classify DuckDB's "table does
      // not exist" SQLException (no SQLState); create the destination
      // up front — Overwrite then drops and recreates it
      conn.createStatement()
        .execute("CREATE TABLE published (id BIGINT, name VARCHAR, score DOUBLE)")
      Sources.write(df.repartition(1), Sources.JdbcSink(url, "published", props))
      val back = Sources.read(spark,
        Sources.JdbcSource(url, "SELECT * FROM published", props))
        .select(col("id").cast("long"), col("name"), col("score").cast("double"))
        .orderBy("id").collect()
      assert(back.map(_.getLong(0)).toSeq === Seq(1L, 2L))
      assert(back.map(_.getDouble(2)).toSeq === Seq(1.5, 2.5))
      // overwrite mode replaces, not appends
      Sources.write(df.repartition(1), Sources.JdbcSink(url, "published", props))
      val rs = conn.createStatement().executeQuery("SELECT COUNT(*) FROM published")
      rs.next()
      assert(rs.getLong(1) === 2L)
    }
  }

  test("I2/I3: full-then-incremental ingest cycle against the database") {
    withDb { (url, conn) =>
      val st = conn.createStatement()
      st.execute("CREATE TABLE src (id BIGINT, date TIMESTAMP)")
      st.execute("""INSERT INTO src VALUES
        (1, TIMESTAMP '2024-01-01 00:00:00'),
        (2, TIMESTAMP '2024-01-02 00:00:00')""")
      val dir = Files.createTempDirectory("graft_jdbc_raw")
      val rawPath = s"$dir/raw"
      val metaPath = s"$dir/meta"
      val source = Sources.incremental(spark,
        Sources.JdbcSource(url, "SELECT * FROM src", props), "date")
      assert(RawLayer.runOnce(spark, source, rawPath, metaPath) === 2L)
      assert(RawLayer.readWatermark(spark, metaPath) === Some("2024-01-02"))
      // new + late row arrive; only the new one passes the watermark
      st.execute("""INSERT INTO src VALUES
        (3, TIMESTAMP '2024-01-04 00:00:00'),
        (4, TIMESTAMP '2024-01-01 12:00:00')""")
      assert(RawLayer.runOnce(spark, source, rawPath, metaPath) === 1L)
      val raw = spark.read.parquet(rawPath)
      assert(raw.select(col("id").cast("long")).collect()
        .map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
      assert(RawLayer.readWatermark(spark, metaPath) === Some("2024-01-04"))
    }
  }
}
