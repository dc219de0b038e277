ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquettoclickhouseschemaspark"
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
// The driver machine-parses the LAST stdout line of `sbt "runMain …"`
// (BENCH parsed:null two rounds running). Two sbt behaviors broke that:
// forked-process output is re-logged with an `[info] ` prefix, and sbt
// appends a `[success] Total time: …` epilogue AFTER the bench's JSON
// line. StdoutOutput passes the forked JVM's stdout through verbatim and
// showSuccess=false drops the epilogue, so the JSON line is genuinely the
// last thing on stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command engine, not another task — exclude
// it from sbt's unused-key lint.
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
  // local[32] with streaming state + broadcast joins GC-thrashes at 8g
  // (q_dedup_exact showed 2-9s run-to-run swings); 24g is comfortable on
  // the 128 GiB host and still env-overridable.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Ad-hoc forked-JVM flags for matched A/B measurement (e.g. GC choice:
// SPARK_GRAFT_JVM_EXTRA="-XX:+UseParallelGC"). Unset (the default, and
// what the driver runs) adds nothing — the bench JVM is unchanged.
// Split on whitespace: one flag per token, so a single flag containing
// spaces (e.g. -Xlog with a quoted path) is NOT representable here.
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
