ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "elasticbloomfilterspark"
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
// inherit stdout directly: sbt's default logger prefixes every forked
// line with "[info] ", which breaks line-oriented JSON parsing of the
// Bench/Verify contract output
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // fixed, pre-touched heap: this sandbox VM charges first-touch page
  // faults at unpredictable times, which showed up as multi-second
  // variance in otherwise identical benchmark trials
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
) ++ (sys.env.get("SPARK_GRAFT_GC") match {
  // A/B knob for the bench: "parallel" -> ParallelGC instead of the
  // JDK-17 default G1. Measured (32M-row flagship, local[32], 3
  // trials back-to-back): ParallelGC 626k docs/s vs G1 733k — the
  // sketch aggregation path prefers G1's concurrent marking (the EBF
  // phase degraded 7.5s -> 10.5s under ParallelGC), so G1 stays.
  case Some("parallel") => Seq("-XX:+UseParallelGC")
  case _                => Seq.empty
})
