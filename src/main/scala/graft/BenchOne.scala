package graft

/** Dev utility: time one or more named queries from [[SparkEntry.queries]]
  * without running the whole [[Bench]] sweep.
  *
  *   sbt "runMain graft.BenchOne b03_sssp_rand64m [more...]"
  *
  * Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench; each query is
  * timed around a count() with caches cleared between queries.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <query name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      GraftSession.defaultCores.toString).toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          }
        }
      })
    args.foreach { name =>
      read.set(0); write.set(0); spill.set(0)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(f"$name: constructed in ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val n = df.count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows, " +
        f"shuffle r/w ${read.get / 1048576.0}%.0f/${write.get / 1048576.0}%.0f MB, " +
        f"spill ${spill.get / 1048576.0}%.0f MB)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
