ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "momyrespark"
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
// The driver parses BENCH_r{N}.json out of the LAST ~2000 chars of sbt's
// stdout. Two pieces of sbt decoration defeated that parse for six rounds:
// (a) forked-process output is routed through the logger and arrives
// prefixed "[info] " (LoggedOutput is the default strategy for run), and
// (b) sbt appends "[success] Total time: ..." AFTER the bench's last line.
// StdoutOutput sends the forked JVM's stdout through verbatim;
// showSuccess := false drops the epilogue — so graft.Bench's compact JSON
// line is the literal, unprefixed final line of stdout.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
showSuccess := false
// Both keys above ARE consumed (showSuccess by the command engine, the
// run-scoped strategy by the forked runner's delegation chain — the
// verbatim bench line is verified end to end); sbt's lintUnused just
// can't see either kind of use. Exclude them so the warning doesn't
// open every batch invocation's stdout.
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
