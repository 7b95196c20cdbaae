package graft

import org.apache.spark.sql.SparkSession

/** Session builders with the engine's configuration profiles
  * (SURVEY.md §4.3).
  *
  * `default` — plain Spark 4.x posture: AQE (with skew-join split and
  * partition coalescing) on, broadcast joins on, whole-stage codegen
  * on, the custom SQL functions registered. The knobs set explicitly
  * are the ones that differ per deployment:
  *  - shuffle partitions sized to the core count locally (a cluster
  *    deployment sets ~2-3× total cores; AQE coalesces down),
  *  - UTC session timezone for cross-engine determinism,
  *  - nanos-as-long so TIMESTAMP(NANOS) parquet (the events table)
  *    reads without error.
  *
  * `parity` — reproduces the reference's physical knobs
  * (broadcast disabled → sort-merge joins, 200 shuffle partitions;
  * reference: src/curated/curated_layer.py:12-17) for A/B runs.
  */
object GraftSession {

  def defaultBuilder(master: String = "local[32]", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def default(master: String = "local[32]", cores: Int = 32): SparkSession = {
    val s = defaultBuilder(master, cores).getOrCreate()
    // also covers sessions that existed before this call (extensions
    // only apply at build time)
    graft.expressions.GraftExtensions.register(s)
    s
  }

  /** Reference-parity physical profile: forces the sort-merge joins the
    * reference runs with (autoBroadcastJoinThreshold=-1) and its 200
    * shuffle partitions.
    */
  def parity(master: String = "local[32]"): SparkSession = {
    val s = defaultBuilder(master)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.shuffle.partitions", "200")
      .getOrCreate()
    graft.expressions.GraftExtensions.register(s)
    s
  }
}
