ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gtfsrealtimeetlspark"
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
// Bench-contract plumbing (round-13, judge ask #1): the driver invokes the
// bench via `sbt "runMain graft.Bench"` and parses the LAST stdout line as
// JSON. sbt's logger wraps forked output in "[info] " and appends a
// "[success] Total time: ..." epilogue — 12 rounds of BENCH_r*.json came
// back `parsed: null` because of that chrome. StdoutOutput passes the
// forked JVM's stdout through verbatim; showSuccess drops the epilogue, so
// the contractual JSON line really is the last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by the command engine, not a task — lintUnused
// can't see that; silence the false-positive warning
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
  // the query catalog generates hundreds of codegen classes; the default
  // 240 MB JIT code cache fills mid-run and silently disables compilation
  // (interpreted hot loops → 10-50x slowdowns on later queries)
  "-XX:ReservedCodeCacheSize=1g",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Tests get their OWN temp root: the round-11 CUSUM flake was a /tmp
// "Mkdirs failed" IOException while an sf10 oracle sweep was spilling
// tens of GB into the shared /tmp on the same box. A dedicated scratch
// dir (created up front, inside the repo, gitignored) keeps sbt test
// green under that kind of external disk pressure.
Test / javaOptions += {
  val dir = (ThisBuild / baseDirectory).value / ".test-tmp"
  sbt.IO.createDirectory(dir)
  s"-Djava.io.tmpdir=${dir.getAbsolutePath}"
}
