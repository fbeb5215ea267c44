ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aitutorbasedonragusinglanchainandvectordbspark"
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
// The driver parses ONE raw JSON line from the captured output tail of
// `sbt runMain graft.Bench`. sbt's default fork output strategy
// (LoggedOutput) prefixes every forked-stdout line with "[info] ", which
// makes a per-line json.loads fail — BENCH_r{1..13}.json all recorded
// parsed:null for exactly this reason. StdoutOutput hands the forked
// JVM sbt's own raw stdout/stderr, so the JSON line survives verbatim.
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
  // WARN-from-first-line logging for the forked mains/tests (the bench
  // driver parses one raw JSON stdout line from a bounded tail). Wired
  // here, not as a src/main/resources classpath file, so the published
  // jar never hijacks a downstream application's log4j2 config.
  s"-Dlog4j2.configurationFile=${baseDirectory.value}/conf/log4j2-quiet.properties",
)
