ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatahdfsrayvssparkspark"
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
// Pass the forked process's stdout through RAW. sbt's default LoggedOutput
// prefixes every line with "[info] ", so the bench's final JSON line never
// starts with '{' and the driver's stdout parser rejects it (this held in
// every round 1-7). StdoutOutput removes the prefix; stderr (Spark logs)
// stays on stderr instead of being re-logged into stdout.
outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and keep sbt's "[success] Total time" epilogue off stdout so the JSON
// line is the LAST thing the driver's 2000-char tail capture sees.
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
  "-Dderby.system.home=/tmp/graft-derby", // metastore_db outside the repo
  // 16g default: enough headroom that GC pressure doesn't pollute bench
  // medians at sf0.1 when the driver doesn't override SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // A 184-query bench session generates thousands of whole-stage-codegen
  // classes; the JDK17 default 240m JIT code cache silently stops
  // compiling when full and late-run queries degrade 5-10x. Double it.
  "-XX:ReservedCodeCacheSize=512m",
)
