ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gonatstoclickhousespark"
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
// The driver's BENCH artifact is json.loads of the LAST 2000 chars of
// raw sbt stdout. Through round 13 that parse failed every round even
// after the compact line fit the window, because sbt decorated the
// tail: forked-run output was logged as "[info] {…}" and the run ended
// with "[success] Total time: …". StdoutOutput passes the forked JVM's
// stdout through verbatim (no logger prefix); showSuccess drops the
// footer. Bench additionally newline-pads before its compact line so
// the scrape window is whitespace + JSON only.
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // local[32] with checkpointed intermediates needs headroom; the image
  // has 128 GiB — 8g caused GC-bound bench numbers.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // A 39-query session generates far more whole-stage-codegen classes
  // than the 240m default code cache holds; when it fills, the JIT
  // silently disables and interpreted-expression queries crawl (observed
  // 15x on the HOF-heavy operators late in a bench session).
  "-XX:ReservedCodeCacheSize=1g",
)
