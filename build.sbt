ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "accessmopperspark"
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
// The bench/verify harness parses machine-readable lines (one JSON line
// from graft.Bench) out of sbt's stdout. The default LoggedOutput wraps
// every forked-process line in "[info] ", which breaks a line-oriented
// JSON parser — pass the child's stdio through verbatim instead, and
// drop the trailing "[success]" banner.
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // local[32] runs driver+executors in one JVM on a 128 GiB box; 8g
  // forced GC pauses mid-query that showed up as 3-6x timing spikes on
  // individual bench queries between runs.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A full bench run generates ~50k distinct JIT methods (one
  // whole-stage-codegen class per stage per query x ~700 query
  // executions); the JDK-17 default 240 MB code cache SATURATES its
  // non-profiled (C2) heap ~45 min in (jcmd showed max_used == size,
  // nmethods collapsing 50k -> 27k under sweeper flushes), after which
  // generated-loop-dominated queries lose their top-tier code and run
  // 3x slower PERSISTENTLY (r14: q240's tier median 13 s -> 35-38 s
  // from pass 3 onward, both full-tier runs, host steal flat, plans
  // and shuffle bytes bit-identical). Any long-lived Spark JVM running
  // thousands of distinct codegen stages needs this headroom - the
  // same tuning applies to real cluster executors at 100 TB.
  "-XX:ReservedCodeCacheSize=512m",
)
