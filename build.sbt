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
  //
  // r12: requests ABOVE 20g are CLAMPED back to 20g unless
  // SPARK_DRIVER_MEM_FORCE=1. Round 11's gate ran with an 89 GB heap
  // (BENCH_LOCAL.json heap_gb: 89) and the same 231-query sweep measured
  // 1205.8 s at 89g vs 624.3 s at 20g on one box (OPTIMIZATION_r12.md):
  // above ~20g G1's bigger regions/card tables turn the sweep's rapid
  // allocate-and-drop churn into mutator-visible stalls (task-CPU per
  // query inflates 4-12× early in the sweep, contention ratios in the
  // hundreds), consistent with the r7 8g-vs-32g measurement. More heap
  // buys this workload nothing — 20g clears the largest anchor with
  // margin — so an oversized request is a measured pessimization, not
  // headroom. A deployment that truly wants a bigger driver sets
  // SPARK_DRIVER_MEM_FORCE=1 alongside SPARK_DRIVER_MEM.
  s"-Xmx${
    val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")
    val gb: Option[Double] = {
      val t = req.trim.toLowerCase
      try {
        if (t.endsWith("g")) Some(t.dropRight(1).toDouble)
        else if (t.endsWith("m")) Some(t.dropRight(1).toDouble / 1024.0)
        else None
      } catch { case _: NumberFormatException => None }
    }
    if (sys.env.get("SPARK_DRIVER_MEM_FORCE").contains("1")) req
    else if (gb.exists(_ > 20.0)) "20g"
    else req
  }",
  // 60+ benched queries generate thousands of Janino/JIT-compiled classes;
  // the JDK default 240 MB code cache fills mid-run and later queries lose
  // JIT compilation entirely.
  "-XX:ReservedCodeCacheSize=512m",
)
