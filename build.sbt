ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ballistaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// The bench harvester parses the LAST line of a ~2000-char combined tail.
// sbt's default forked-run logger prefixes child stdout with "[info] " and
// appends a "[success] Total time: ..." banner AFTER the bench JSON — 15
// rounds of BENCH_r*.json came back "parsed": null because of those two
// lines. Pass forked-process output through verbatim and drop the banner so
// graft.Bench's compact JSON is the final stdout line sbt emits.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by a task — lintUnused
// can't see that and would print a [warn] block into every run's tail
Global / excludeLintKeys += showSuccess
// suites share one SparkSession and HygieneSpec asserts GLOBAL storage
// state (getPersistentRDDs empty after release) — concurrent suites would
// race those assertions; Spark parallelizes within each job anyway
Test / parallelExecution := false
run / fork := true
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
