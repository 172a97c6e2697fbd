ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pulsarsyncjavaspark"
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
// forked run output passes through to stdout BARE — without this, sbt
// re-logs every program line with an "[info] " prefix, which is what
// kept seven rounds of driver bench parses null: the final JSON line
// was in the tail window but never bare
run / outputStrategy := Some(StdoutOutput)
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

// ---- live transport binding (compile-off by default) ----
// The Pulsar binding under src/live-pulsar needs the pulsar-client
// jars, which do not exist in this zero-egress environment. Point
// GRAFT_PULSAR_JARS at a directory of pulsar-client-all (or
// pulsar-client + pulsar-client-admin) jars to compile and test it:
//   GRAFT_PULSAR_JARS=/path/to/pulsar/lib sbt compile
// The binding implements EnvelopeBroker/WritableEnvelopeBroker and is
// certified by re-instantiating EnvelopeBrokerTCK (see
// src/live-pulsar-test) against a standalone broker.
Compile / unmanagedSourceDirectories ++=
  sys.env.get("GRAFT_PULSAR_JARS").toSeq.map(_ =>
    baseDirectory.value / "src" / "live-pulsar" / "scala")
Test / unmanagedSourceDirectories ++=
  sys.env.get("GRAFT_PULSAR_JARS").toSeq.map(_ =>
    baseDirectory.value / "src" / "live-pulsar-test" / "scala")
Compile / unmanagedJars ++=
  sys.env.get("GRAFT_PULSAR_JARS").toSeq.flatMap(d =>
    ((file(d) ** "*.jar") --- (file(d) ** "*sources*.jar")).classpath)
