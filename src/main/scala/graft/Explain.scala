package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query, print wall time and the formatted
  * physical plan. `runMain graft.Explain <queryName> [sfDir] [--plan]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
      else "/root/testdata/sf0.1"
    val showPlan = args.contains("--plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      GraftSession.defaultCores.toString).toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("--jobs")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            // The last stage's call site names the action — enough to map
            // a slow job back to the operator without the (disabled) UI.
            val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
            starts.put(j.jobId, (System.nanoTime(), site))
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, site) = starts.remove(j.jobId)
            println(f"[job] ${j.jobId}: ${(System.nanoTime() - t0) / 1e6}%.0f ms  $site")
          }
        })
    }
    // Optional untimed warmup on another scale factor (--warm <dir>):
    // isolates codegen/JIT compilation cost from data cost.
    val warmIdx = args.indexOf("--warm")
    if (warmIdx >= 0) {
      require(warmIdx + 1 < args.length && !args(warmIdx + 1).startsWith("--"),
        "--warm requires a directory operand")
      SparkEntry.queries(name)(spark, args(warmIdx + 1)).count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    // Construction is inside the timer: iterative queries (engine loops,
    // Borůvka) run their supersteps while BUILDING the result DataFrame.
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val n = df.count()
    println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    if (showPlan) df.explain("formatted")
    val t1 = System.nanoTime()
    val n2 = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[explain] $name (2nd run): $n2 rows in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
