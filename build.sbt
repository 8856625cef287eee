ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gmrspark"
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
// Forked output verbatim (no "[info] " logger prefix): Bench's contract is
// ONE machine-parseable JSON line on stdout — a prefixed line fails any
// strict json.loads on the consumer side.
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
  // 20g default. History: 8g measured faster than 32g for the early
  // 59-query bench (83 s vs 217 s — full-GC pauses over block residue),
  // and was the default through round 7. But the 64M-edge GraphX anchor
  // (b06, round 7+) needs >16g at any partitioning (measured: OOM at 8g
  // and 16g, clean at 20g with the runner's 8-partition cap) — and an
  // OOM mid-run kills the SparkContext and fails EVERY remaining query,
  // which is how a whole gate round can produce no artifacts. 20g clears
  // b06 with margin on the 128 GiB hosts (the fresh full-bench total at
  // 20g is recorded in BENCH_LOCAL.json). Override via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // 60+ benched queries generate thousands of Janino/JIT-compiled classes;
  // the JDK default 240 MB code cache fills mid-run and later queries lose
  // JIT compilation entirely.
  "-XX:ReservedCodeCacheSize=512m",
)
