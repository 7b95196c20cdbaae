package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-based data-quality screens for training corpora.
  *
  * Everything is exact integer/decimal arithmetic: the z-score test
  * |x − μ| > kσ is evaluated as (n·x − s)² > k²·(n·ss − s²) — the
  * n²-scaled form with no division and no square root — so two engines
  * (or two runs over different partitionings) agree on every boundary
  * row. A float variance would disagree exactly on the rows the test
  * exists to find.
  */
object Quality {

  /** Rows whose integer-cents value lies more than `sigmas` population
    * standard deviations from their group's mean. One aggregate pass +
    * a broadcast of the per-group (n, s, ss) triple — the corpus is
    * scanned twice but shuffled never (the stats frame is
    * groups-cardinality small).
    *
    * Declared decimal widths bound the products away from Spark's
    * 38-digit cap. Safe domain: |cents| ≤ 1e8 (values ≤ $1M) and group
    * rows ≤ 1e10 — then s ≤ 1e18 < 1e26, ss ≤ 1e26 < 1e36, and the
    * final comparison's largest terms (dev² ≤ ~1e37, n·ss ≤ 1e36) stay
    * inside DECIMAL(38). Outside that domain ANSI mode throws rather
    * than corrupts.
    */
  def zScoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
      sigmas: Int = 3): DataFrame = {
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val withCents = df.withColumn("__xc",
      expr(s"CAST(floor($valueCol * 100 + 0.5) AS DECIMAL(10,0))"))
    val stats = withCents.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(DecimalType(10, 0)).as("__n"),
      sum(col("__xc")).cast(DecimalType(26, 0)).as("__s"),
      sum(col("__xc") * col("__xc")).cast(DecimalType(36, 0)).as("__ss"))
    val dev = col("__n") * col("__xc") - col("__s")
    withCents.join(broadcast(stats), Seq(groupCol))
      .filter(dev * dev >
        lit(sigmas.toLong * sigmas) * (col("__n") * col("__ss") - col("__s") * col("__s")))
      .drop("__xc", "__n", "__s", "__ss")
  }

  /** Composition drift between two corpus snapshots — the
    * population-stability check a continuously-ingesting training
    * pipeline runs before every retrain: per category-key, each
    * snapshot's share in exact parts-per-million (integer floor
    * division against the snapshot total, no IEEE ratio anywhere) and
    * the absolute ppm delta. A full outer join keeps categories that
    * appear in only one snapshot (share 0 on the other side) — exactly
    * the rows a drift monitor must not drop. Two aggregate shuffles
    * over (key, count) pairs + two broadcast scalars; corpus size
    * never crosses the network.
    */
  def snapshotDrift(prev: DataFrame, cur: DataFrame, keyCol: String): DataFrame = {
    def shares(df: DataFrame, n: String, ppm: String): DataFrame = {
      val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as(n))
      val total = counts.agg(sum(col(n)).as("__t"))
      counts.join(broadcast(total))
        .withColumn(ppm, expr(s"CAST(($n * 1000000L) DIV __t AS BIGINT)"))
        .drop("__t")
    }
    val a = shares(prev, "n_prev", "ppm_prev")
    val b = shares(cur, "n_cur", "ppm_cur")
    a.join(b, Seq(keyCol), "full_outer")
      .na.fill(0L, Seq("n_prev", "ppm_prev", "n_cur", "ppm_cur"))
      .withColumn("drift_ppm", abs(col("ppm_cur") - col("ppm_prev")))
  }

  /** Compression-ratio quality signal (the Gopher/FineWeb heuristic):
    * highly repetitive machine-generated text deflates far below
    * natural prose, so `deflate_len·1000 div raw_len` separates the
    * two with zero linguistic knowledge. Runs in `mapPartitions` so
    * ONE `java.util.zip.Deflater` (fixed level, reset between rows)
    * serves the whole partition — per-row construction would dominate
    * at 100 TB. Per-row compute, no shuffle; deterministic for a fixed
    * JVM zlib, but not reproducible in a SQL engine — per-doc values
    * are value-grounded by specs (repetitive < prose ratio,
    * partitioning-invariant), and the catalog grades the signal
    * through a planted-class oracle (q136: exact class rates + strict
    * ordering, both SQL-computable facts).
    */
  def compressionSignals(df: DataFrame, idCol: String, textCol: String,
      level: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        // native zlib state is off-heap: release it when the task ends
        // (not just when the iterator drains — a downstream limit() may
        // never exhaust it)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val raw = if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          (id, raw.length.toLong, compressed,
            compressed * 1000L / math.max(raw.length.toLong, 1L))
        }
      }
      .toDF(idCol, "raw_len", "deflate_len", "ratio_permille")
  }
}
