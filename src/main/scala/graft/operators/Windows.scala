package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for rank-family window functions over
  * LOW-CARDINALITY partition keys — the classic 100 TB wall.
  *
  * `rank().over(Window.partitionBy(flag).orderBy(v))` with a 3-value
  * `flag` plans a WindowExec whose tasks each hold a whole partition:
  * the full corpus sorts in 3 tasks (measured 153.5 s at sf10;
  * three ~33 TB single-task sorts at 100 TB). Unlike top-k queries
  * there is no WindowGroupLimit rescue, because every row is emitted.
  *
  * This operator generalizes [[Ids.denseIds]]' bucketed construction:
  * rank splits into (rows in earlier VALUE BUCKETS) + (rows before
  * this value inside its bucket), so every corpus-sized step is
  * partitioned by (partition key, bucket) — parallelism =
  * #partitions × #buckets, chosen by `bucketWidth`, independent of the
  * partition key's cardinality:
  *
  *  1. collapse the corpus to distinct (part, key) pairs with
  *     multiplicities — one map-side-combined aggregation, the only
  *     data-sized shuffle, carrying one row per DISTINCT pair (for the
  *     tie-heavy orderings rank functions are used on, far smaller
  *     than the corpus);
  *  2. per-(part, bucket) row/value counts → exclusive prefix sums
  *     per part (windows over BUCKET-cardinality rows, broadcast
  *     back);
  *  3. within-bucket windows partitioned by (part, bucket) — parallel;
  *  4. join the per-(part, key) rank columns back to the corpus on
  *     (part, key) — AQE turns this into a broadcast join whenever the
  *     distinct frame is small (q99: 3 × ~51 rows).
  *
  * rank = rowsBefore + tiesBefore + 1; dense_rank = valuesBefore +
  * value row_number; percent_rank = (rank−1)/(N−1) and cume_dist =
  * (rank−1+ties)/N are each ONE division of exact integers — the same
  * computation the built-ins do, so results are bit-identical across
  * engines (the catalog's no-round rule).
  *
  * `keyCol` must be a NON-NEGATIVE integral column (truncating DIV
  * would fold bucket −0.x onto 0.x otherwise — same contract as
  * [[Ids.denseIds]]) and, like the partition columns, NON-NULL
  * (ADVICE r12): the bucketed construction re-attaches ranks by
  * equi-join, and equality joins drop NULL keys — the built-ins rank
  * NULL keys, so silently returning fewer rows would be a wrong
  * result, not a contract. A NULL in any key/partition cell fails the
  * job loudly AT EXECUTION TIME via an assert folded into the key
  * expression — no extra corpus scan, the check rides the one
  * aggregation pass that was already reading every row.
  * `descending` orders by `keyCol` DESC; key DIV width is monotone on
  * non-negative keys, so bucket-major order equals key order in
  * either direction.
  */
object Windows {

  private def bucketOf(keyCol: String, bucketWidth: Long): Column =
    expr(s"CAST(`$keyCol` DIV ${bucketWidth}L AS BIGINT)")

  /** `keyCol`, with the non-null contract enforced per row: a row with
    * a NULL key or partition cell evaluates the raise_error branch and
    * fails the job. The guard cannot be pruned away because it IS the
    * key value the rest of the plan consumes, and it costs nothing on
    * conforming rows (the error branch never evaluates).
    */
  private def guardedKey(keyCol: String, partCols: Seq[String]): Column = {
    val nonNull = partCols.foldLeft(col(keyCol).isNotNull) {
      (acc, p) => acc && col(p).isNotNull
    }
    when(nonNull, col(keyCol)).otherwise(raise_error(lit(
      s"graft.Windows: NULL in key '$keyCol' or partition columns " +
        s"${partCols.mkString("(", ", ", ")")} — the bucketed rank " +
        "contract requires non-null key and partition values " +
        "(built-in window functions rank NULL keys; this operator " +
        "refuses rather than silently dropping them)")))
  }

  private def dir(c: Column, descending: Boolean): Column =
    if (descending) c.desc else c.asc

  /** Appends `rnk`, `drnk` (BIGINT), `prnk`, `cdist` (DOUBLE) —
    * rank/dense_rank/percent_rank/cume_dist over
    * `partitionBy(partCols).orderBy(keyCol [DESC])` — with no
    * corpus-sized window partition.
    */
  def rankFunctions(df: DataFrame, partCols: Seq[String], keyCol: String,
      descending: Boolean = false, bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(partCols.nonEmpty, "partCols must not be empty")
    val part = partCols.map(col)
    // 1. distinct (part, key) with multiplicity — the one data-sized
    //    shuffle, map-side combined down to distinct pairs. The
    //    grouping key is the GUARDED key: a NULL key/partition cell
    //    fails this pass loudly instead of being dropped by the
    //    re-attach join in step 4 (ADVICE r12).
    val vals = df.groupBy((part :+ guardedKey(keyCol, partCols).as(keyCol)): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__bucket", bucketOf(keyCol, bucketWidth))
    // 2. per-bucket totals → per-part exclusive prefix sums; these
    //    windows run over bucket-cardinality rows (key_range/width per
    //    part), never corpus rows
    val perBucket = vals.groupBy((part :+ col("__bucket")): _*)
      .agg(sum(col("__cnt")).as("__brows"), count(lit(1)).as("__bvals"))
    val wOff = Window.partitionBy(part: _*)
      .orderBy(dir(col("__bucket"), descending))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("__rowsBefore", coalesce(sum(col("__brows")).over(wOff), lit(0L)))
      .withColumn("__valsBefore", coalesce(sum(col("__bvals")).over(wOff), lit(0L)))
      .select((part :+ col("__bucket") :+ col("__rowsBefore") :+ col("__valsBefore")): _*)
    val totals = perBucket.groupBy(part: _*).agg(sum(col("__brows")).as("__nTotal"))
    // 3. within-bucket windows — partitioned by (part, bucket)
    val wIn = Window.partitionBy((part :+ col("__bucket")): _*)
      .orderBy(dir(col(keyCol), descending))
    val ranked = vals
      .join(broadcast(offsets), partCols :+ "__bucket")
      .withColumn("__ties",
        coalesce(sum(col("__cnt")).over(
          wIn.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("rnk", col("__rowsBefore") + col("__ties") + lit(1L))
      .withColumn("drnk", col("__valsBefore") + row_number().over(wIn).cast("long"))
      .join(broadcast(totals), partCols)
      .withColumn("prnk",
        when(col("__nTotal") === 1L, lit(0.0))
          .otherwise((col("rnk") - 1L).cast("double") /
            (col("__nTotal") - 1L).cast("double")))
      .withColumn("cdist",
        (col("rnk") - 1L + col("__cnt")).cast("double") /
          col("__nTotal").cast("double"))
      .select((part :+ col(keyCol) :+ col("rnk") :+ col("drnk") :+
        col("prnk") :+ col("cdist")): _*)
    // 4. rank columns are a function of (part, key) only — re-attach
    //    by key; AQE broadcasts the distinct frame when it is small
    df.join(ranked, partCols :+ keyCol)
  }

  /** Appends `row_num` (BIGINT, 1-based) — row_number over
    * `partitionBy(partCols).orderBy(keyCol [DESC], tieCols…)` — with
    * no corpus-sized window partition. `tieCols` carry their own sort
    * direction (`col("id")` / `col("id").desc`) and together with
    * `keyCol` must totally order each partition for the result to be
    * deterministic.
    */
  def rowNumbers(df: DataFrame, partCols: Seq[String], keyCol: String,
      tieCols: Seq[Column], descending: Boolean = false,
      bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(partCols.nonEmpty, "partCols must not be empty")
    val part = partCols.map(col)
    // bucket from the GUARDED key: a NULL key/partition cell throws
    // here, per row, instead of vanishing in the offsets join
    val keyed = df.withColumn("__gkey", guardedKey(keyCol, partCols))
      .withColumn("__bucket", bucketOf("__gkey", bucketWidth))
      .drop("__gkey")
    val counts = keyed.groupBy((part :+ col("__bucket")): _*)
      .agg(count(lit(1)).as("__n"))
    val wOff = Window.partitionBy(part: _*)
      .orderBy(dir(col("__bucket"), descending))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__offset", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select((part :+ col("__bucket") :+ col("__offset")): _*)
    val wIn = Window.partitionBy((part :+ col("__bucket")): _*)
      .orderBy(dir(col(keyCol), descending) +: tieCols: _*)
    keyed.join(broadcast(offsets), partCols :+ "__bucket")
      .withColumn("row_num",
        col("__offset") + row_number().over(wIn).cast("long"))
      .drop("__bucket", "__offset")
  }

  /** Appends `tile` (BIGINT) — `ntile(n)` over
    * `partitionBy(partCols).orderBy(keyCol [DESC], tieCols…)` — via
    * [[rowNumbers]] plus the ntile arithmetic (first N mod n buckets
    * get ⌈N/n⌉ rows, the rest ⌊N/n⌋ — the SQL-standard split both
    * Spark and DuckDB implement), all exact integers.
    */
  def ntileBucketed(df: DataFrame, partCols: Seq[String], keyCol: String,
      tieCols: Seq[Column], n: Int, descending: Boolean = false,
      bucketWidth: Long = 1000L): DataFrame = {
    require(n >= 1, s"ntile n must be >= 1: $n")
    val part = partCols.map(col)
    val rn = rowNumbers(df, partCols, keyCol, tieCols, descending, bucketWidth)
    val totals = rn.groupBy(part: _*).agg(count(lit(1)).as("__nTotal"))
    // per-partition-VALUE frame (one row per distinct partition key):
    // AQE broadcasts it when small; never corpus-sized relative to df
    rn.join(totals, partCols)
      .withColumn("__base", expr(s"__nTotal DIV ${n}L"))
      .withColumn("__rem", col("__nTotal") % n)
      .withColumn("__cut", col("__rem") * (col("__base") + 1L))
      .withColumn("tile",
        when(col("row_num") <= col("__cut"),
          expr("(row_num - 1) DIV (__base + 1) + 1"))
          .otherwise(expr("__rem + (row_num - __cut - 1) DIV __base + 1")))
      .drop("__nTotal", "__base", "__rem", "__cut")
  }
}
