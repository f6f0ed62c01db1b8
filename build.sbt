ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hivefeaturedemospark"
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
// The bench/verify harness parses the LAST stdout line as JSON. Two sbt
// behaviors defeat that for forked runs: (a) child stdout is re-logged
// through sbt's logger with an "[info] " prefix; (b) sbt appends its own
// "[success] Total time: …" epilogue after the program exits. Route the
// forked JVM's stdout straight through and drop the epilogue so the
// program's own final line is the final line of the build's stdout.
Global / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by a task — the
// lintUnused warning is a false positive.
Global / excludeLintKeys += showSuccess
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
  // Logging config for the forked run/test JVMs only. Deliberately NOT
  // at the classpath-root default name: a log4j2.properties at the jar
  // root would ship in the library artifact and silently override any
  // downstream consumer's logging (r4 advice). Mains also self-select
  // it (first line of main) for non-sbt launches.
  "-Dlog4j2.configurationFile=classpath:graft/tool-log4j2.properties",
)
