ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "chatnoirresiliparsespark"
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
// The forked JVM's stdout must reach this process's stdout RAW: sbt's
// default LoggedOutput strategy prefixes every relayed line with
// "[info] ", which defeats any line-anchored grep for the bench's
// `BENCH_JSON:` digest (the driver harness parsed NOTHING in r09-r17 —
// PERF_rNN.per_query stayed empty every round). With StdoutOutput both
// the full one-line JSON blob and the BENCH_JSON: digest sit at true
// line start; the forked stderr (Spark logs, progress lines) goes to
// this process's stderr instead of being [error]-relayed onto stdout.
outputStrategy := Some(StdoutOutput)
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
  // 28g default: the sandbox has 128 GiB and the driver benches at
  // local[32] — 32 concurrent HTML-parse/LSH tasks in the old 8g default
  // GC-thrashed the extraction-bound queries 30-170x (round-6 driver run:
  // w19 148s vs 4.5s with an adequate heap on identical code)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  // batch-throughput workload: parallel scavenge beats G1 by ~6% on the
  // allocation-heavy extraction kernels (measured on w19)
  "-XX:+UseParallelGC",
)
