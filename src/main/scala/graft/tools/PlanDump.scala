package graft.tools

/** Writes `.explain("formatted")` for the named queries to files —
  * the plan evidence the optimization rounds commit next to their
  * before/after bench numbers (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> q1,q2,...
  * Query names may be prefixes (the Verify convention).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.defaultBuilder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val prefixes = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"${q}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${q}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
