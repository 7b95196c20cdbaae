ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "batchprocessingetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// DuckDB's JDBC driver (a public Maven artifact) value-verifies the
// JDBC source/sink against a real embedded database, TEST-only. Picked
// up unmanaged from the local cache when present — no resolution, no
// egress; the JDBC specs cancel themselves when the jar is absent.
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  if (cache.exists) (cache ** "duckdb_jdbc-*.jar").classpath else Nil
}
Test / fork := true
run / fork := true
// Pass the forked run's stdout through UNPREFIXED. With the default
// LoggedOutput strategy sbt wraps every Bench stdout line as
// "[info] {...}" and appends its own "[success] Total time" trailer,
// which defeated the driver's last-line JSON parse for five rounds
// (BENCH_r0{1..5}.json all have "parsed": null while the JSON line is
// visibly present in the tail). StdoutOutput = raw passthrough.
run / outputStrategy := Some(StdoutOutput)
// ...and drop sbt's own "[success] Total time" trailer, so the forked
// Bench's compact JSON really is the LAST stdout line a driver-side
// last-line parser sees (belt to the StdoutOutput suspenders; Bench
// additionally prints the JSON twice).
showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
