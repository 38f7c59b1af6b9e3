ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pastapipelinespark"
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
  // A 95+-query suite in one JVM generates enough codegen classes to
  // saturate the default 240 MB code cache's ~117 MB segments; the
  // sweeper then flushes warm kernels and later queries pay the
  // re-warm (measured: c28 5.8-6.9 s in-suite at sf10 vs 2.3-2.6 s
  // standalone at the default; 3.0 s in-suite at 512 MB — SURVEY §6
  // r15). 512 MB removes the cliff for a few hundred MB of virtual
  // reservation.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // extra forked-JVM flags for experiments (e.g. a spark.* system
  // property or a -XX: flag), space-separated:
  //   SPARK_GRAFT_JAVA_OPTS="-Dspark.cleaner.periodicGC.interval=30s"
  // Limitation: split on bare whitespace, no quoting — an option
  // whose VALUE contains a space cannot be passed this way.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").map(_.split("\\s+").toSeq.filter(_.nonEmpty))
    .getOrElse(Seq.empty)
