package graft.tools
/** Prints formatted physical plans for headline queries and greps for
  * the properties we require at scale: pushed filters, broadcast joins
  * for small dims, whole-stage codegen coverage, window group limits.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.defaultBuilder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"===== $q =====")
      println(plan)
    }
    spark.stop()
  }
}
