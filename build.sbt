ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusionlokispark"
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
// The bench/verify driver parses the LAST stdout line of `sbt runMain` as
// JSON. Two sbt behaviors defeat that: the logger's "[info] " prefix on
// forked output, and the "[success] Total time: ..." footer printed after
// the run (every round 1-8 BENCH artifact ends with that footer and
// `parsed: null`). Route forked stdout straight through (stderr stays on
// stderr, so Spark logs leave the stdout capture too) and suppress the
// footer so the process's last stdout line is the program's last println.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// the two keys are read by sbt's command engine, not a task — lint
// can't see that
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pin the committed heap: G1 uncommits after the bench harness's
  // System.gc() calls, and re-expanding under a heavy cached stage
  // page-faults fresh pages mid-query (measured as multi-second
  // same-launch-time task stalls in the event log)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // experiment hook: extra JVM flags for the forked run (GC trials etc.)
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
