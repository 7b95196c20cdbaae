package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windows (bucketed rank family) ≡ Spark's built-in window functions,
  * plus the plan guard: no window may hold a corpus-sized partition.
  */
class WindowsSpec extends SparkSpec {

  import spark.implicits._

  private val rng = new scala.util.Random(42)
  // 3 low-card partitions, tie-heavy keys 0..40 — the q99 shape
  private lazy val tied: DataFrame = (1 to 500).map { i =>
    (i.toLong, s"p${rng.nextInt(3)}", rng.nextInt(41).toLong)
  }.toDF("id", "part", "key").cache()

  private def rows(df: DataFrame, cols: String*): Seq[Seq[Any]] =
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq).sortBy(_.mkString(""))

  test("rankFunctions ≡ built-in rank/dense_rank/percent_rank/cume_dist (asc)") {
    val w = Window.partitionBy(col("part")).orderBy(col("key"))
    val exp = tied.select(col("id"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      percent_rank().over(w).as("prnk"),
      cume_dist().over(w).as("cdist"))
    val got = Windows.rankFunctions(tied, Seq("part"), "key", bucketWidth = 7L)
    assert(rows(got, "id", "rnk", "drnk", "prnk", "cdist") ===
      rows(exp, "id", "rnk", "drnk", "prnk", "cdist"))
  }

  test("rankFunctions ≡ built-ins (desc ordering)") {
    val w = Window.partitionBy(col("part")).orderBy(col("key").desc)
    val exp = tied.select(col("id"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      percent_rank().over(w).as("prnk"),
      cume_dist().over(w).as("cdist"))
    val got = Windows.rankFunctions(tied, Seq("part"), "key",
      descending = true, bucketWidth = 7L)
    assert(rows(got, "id", "rnk", "drnk", "prnk", "cdist") ===
      rows(exp, "id", "rnk", "drnk", "prnk", "cdist"))
  }

  test("rankFunctions: single-row partition → percent_rank 0.0, cume_dist 1.0") {
    val df = Seq((1L, "solo", 9L)).toDF("id", "part", "key")
    val r = Windows.rankFunctions(df, Seq("part"), "key").collect().head
    assert(r.getAs[Long]("rnk") === 1L)
    assert(r.getAs[Long]("drnk") === 1L)
    assert(r.getAs[Double]("prnk") === 0.0)
    assert(r.getAs[Double]("cdist") === 1.0)
  }

  test("rowNumbers ≡ built-in row_number (asc and desc, tie-broken by id)") {
    for (desc <- Seq(false, true)) {
      val ord = if (desc) col("key").desc else col("key").asc
      val w = Window.partitionBy(col("part")).orderBy(ord, col("id"))
      val exp = tied.select(col("id"),
        row_number().over(w).cast("long").as("row_num"))
      val got = Windows.rowNumbers(tied, Seq("part"), "key",
        tieCols = Seq(col("id")), descending = desc, bucketWidth = 7L)
      assert(rows(got, "id", "row_num") === rows(exp, "id", "row_num"),
        s"descending=$desc")
    }
  }

  test("ntileBucketed ≡ built-in ntile for n = 1, 3, 10") {
    for (n <- Seq(1, 3, 10)) {
      val w = Window.partitionBy(col("part"))
        .orderBy(col("key").desc, col("id"))
      val exp = tied.select(col("id"),
        ntile(n).over(w).cast("long").as("tile"))
      val got = Windows.ntileBucketed(tied, Seq("part"), "key",
        tieCols = Seq(col("id")), n = n, descending = true, bucketWidth = 7L)
      assert(rows(got, "id", "tile") === rows(exp, "id", "tile"), s"n=$n")
    }
  }

  test("ntileBucketed: partition smaller than n → tile = row_number") {
    val df = Seq((1L, "p", 5L), (2L, "p", 3L), (3L, "p", 9L))
      .toDF("id", "part", "key")
    val got = Windows.ntileBucketed(df, Seq("part"), "key",
      tieCols = Seq(col("id")), n = 10)
      .select(col("id"), col("tile")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // asc by key: id2(3) → tile 1, id1(5) → 2, id3(9) → 3
    assert(got === Map(2L -> 1L, 1L -> 2L, 3L -> 3L))
  }

  // ---- non-null contract (ADVICE r12) --------------------------------

  test("rankFunctions: NULL key fails loudly instead of dropping rows") {
    val df = Seq((1L, "p", java.lang.Long.valueOf(3L)),
      (2L, "p", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "part", "key")
    val e = intercept[Exception] {
      Windows.rankFunctions(df, Seq("part"), "key").count()
    }
    assert(e.getMessage.contains("graft.Windows") ||
      Option(e.getCause).exists(_.getMessage.contains("graft.Windows")))
  }

  test("rowNumbers: NULL partition value fails loudly instead of dropping rows") {
    val df = Seq((1L, "p", 3L), (2L, null.asInstanceOf[String], 5L))
      .toDF("id", "part", "key")
    val e = intercept[Exception] {
      Windows.rowNumbers(df, Seq("part"), "key", tieCols = Seq(col("id"))).count()
    }
    assert(e.getMessage.contains("graft.Windows") ||
      Option(e.getCause).exists(_.getMessage.contains("graft.Windows")))
  }

  // ---- degenerate inputs (VERDICT r12 #6) -----------------------------

  test("rankFunctions: empty frame returns empty with the rank columns") {
    val empty = tied.limit(0)
    val got = Windows.rankFunctions(empty, Seq("part"), "key")
    assert(got.count() === 0L)
    assert(Seq("rnk", "drnk", "prnk", "cdist").forall(got.columns.contains))
    assert(Windows.rowNumbers(empty, Seq("part"), "key",
      tieCols = Seq(col("id"))).count() === 0L)
  }

  test("rankFunctions: single-bucket key domain ≡ built-ins (bucketWidth ≫ keys)") {
    val w = Window.partitionBy(col("part")).orderBy(col("key"))
    val exp = tied.select(col("id"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      percent_rank().over(w).as("prnk"),
      cume_dist().over(w).as("cdist"))
    // all keys (0..40) land in bucket 0 — the construction degenerates
    // to one within-bucket window per partition and must stay exact
    val got = Windows.rankFunctions(tied, Seq("part"), "key",
      bucketWidth = 1000000L)
    assert(rows(got, "id", "rnk", "drnk", "prnk", "cdist") ===
      rows(exp, "id", "rnk", "drnk", "prnk", "cdist"))
  }

  // ---- plan guard: no corpus-sized window partition -----------------

  /** Every WindowExec must be either bucket-partitioned (its partition
    * spec references a `__bucket` column — parallelism chosen by
    // bucketWidth, independent of the partition key's cardinality) or
    * run over an AGGREGATED frame (bucket/value cardinality, not
    * corpus rows). A window partitioned only by a low-cardinality data
    * column directly over the corpus — the 153 s-at-sf10 q99 shape —
    * fails both arms.
    */
  private def auditWindows(df: DataFrame): Unit = {
    def skipNarrow(p: SparkPlan): SparkPlan = p match {
      case x: ProjectExec => skipNarrow(x.child)
      case x: FilterExec  => skipNarrow(x.child)
      case x: SortExec    => skipNarrow(x.child)
      case x: Exchange    => skipNarrow(x.child)
      case x              => x
    }
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in the plan")
    wins.foreach { w =>
      val partNames = w.partitionSpec.flatMap(_.references.toSeq.map(_.name))
      val bucketed = partNames.exists(_.startsWith("__bucket"))
      val overAggregate = skipNarrow(w.child).isInstanceOf[BaseAggregateExec]
      assert(bucketed || overAggregate,
        s"corpus-sized window partition ${partNames.mkString(",")} over " +
          s"${skipNarrow(w.child).nodeName} — the single-task-sort wall")
    }
  }

  test("q99 plan: no window holds a corpus-sized partition") {
    auditWindows(graft.SparkEntry.queries("q99_rank_functions")(
      spark, "/root/testdata/sf0.001"))
  }

  test("q82 plan: no window holds a corpus-sized partition") {
    auditWindows(graft.SparkEntry.queries("q82_docs_quality_deciles")(
      spark, "/root/testdata/sf0.001"))
  }

  test("the naive q99 shape fails the audit (guard is discriminating)") {
    val w = Window.partitionBy(col("part")).orderBy(col("key"))
    val naive = tied.select(col("id"), rank().over(w).as("rnk"))
    assertThrows[org.scalatest.exceptions.TestFailedException] {
      auditWindows(naive)
    }
  }
}
