ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkemqxconnectorspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress).
// Upgrade procedure: point this at the new distribution, bump
// graft.SparkVersionAssumption.assumed, run the full suite, and
// re-adjudicate the version-coupled pins that object lists (there is
// no second-version CI compile in this offline environment).
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The round driver tail-captures `sbt runMain` stdout and parses the
// LAST line as JSON. sbt's default LoggedOutput prefixes every forked
// line with "[info] " and appends a "[success] Total time..." line,
// which defeated that parse from r8 through r13. StdoutOutput passes
// the forked JVM's stdout through undecorated, and showSuccess drops
// the trailing success banner, so Bench/Verify's final println is the
// genuine last stdout line.
Compile / run / outputStrategy := Some(StdoutOutput)
showSuccess := false
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
)
