ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "burst_dbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses Bench's final stdout line as one JSON object. sbt's
// default forked-output handling wraps child stdout in "[info] " and child
// stderr in "[error] ", then appends its own "[success] Total time" trailer
// — BENCH_r14/r15 both came back parsed:null because of exactly that.
// StdoutOutput forwards the forked process's stdout/stderr to this
// process's streams RAW; showSuccess/showTiming drop the trailer, so the
// bench JSON is the literal last stdout line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// showSuccess/showTiming are consumed by sbt's command engine, not by
// other settings — exclude them from the unused-key lint.
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // default sized to the 128 GiB bench host: 8g under-provisioned a
  // local[32] run (32 concurrent tasks share execution memory; GC showed
  // up as 0.3-2 s per heavy query in stage profiles; full bench ~5 s
  // faster at 16g). Override per environment via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
