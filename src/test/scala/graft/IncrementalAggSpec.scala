package graft

import org.scalatest.funsuite.AnyFunSuite

/** The q66 materialized-view contract, measured: refreshing the rollup
  * aggregates only the newly-arrived slice plus the tiny stored partials —
  * never rescans history. On the production layout for an incremental
  * fact table (date-partitioned), the delta scan directory-prunes, and
  * recordsRead during the refresh action is the evidence (the
  * BucketingSpec measurement discipline). The combine itself must
  * reproduce the one-pass rollup value for value.
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("mv refresh on a date-partitioned fact reads the delta slice, " +
      "not history") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = graft.sources.FormatRoundtrip.mvSource(spark, sfDir)
    val cutoffYear = graft.sources.FormatRoundtrip.MvCutoff.take(4).toInt
    // The incremental fact layout: partitioned by ship year (q66's cutoff
    // sits on a year boundary, so "the delta" is exactly the new
    // partitions).
    val part = TestSpark.tempDir("graft_mv66_fx")
    src.withColumn("yr", year($"d"))
      .write.partitionBy("yr").mode("overwrite").parquet(part)
    val mv = graft.sources.FormatRoundtrip.mvBuild(spark, sfDir)
    val total = src.count()
    val deltaRows = src.filter(year($"d") >= cutoffYear).count()
    // The fixture must actually have history to skip, and a real delta.
    assert(deltaRows > 0 && deltaRows < total / 2,
      s"degenerate split: $deltaRows of $total")

    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          read.addAndGet(t.taskMetrics.inputMetrics.recordsRead): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    val refreshed =
      try {
        read.set(0)
        // The ingest job hands over its new slice: the partition-pruned
        // scan of the new year's directories.
        val delta = spark.read.parquet(part)
          .filter($"yr" >= cutoffYear)
          .select($"l_returnflag", $"d", $"q", $"l_extendedprice")
        val out = graft.sources.FormatRoundtrip.mvRefresh(spark, mv, delta)
          .collect()
        var prev = -1L
        var tries = 0
        while (read.get != prev && tries < 40) {
          prev = read.get; Thread.sleep(25); tries += 1
        }
        out
      } finally spark.sparkContext.removeSparkListener(listener)
    // Delta rows + a handful of stored partial rows — history is never
    // materialized. The slack absorbs scan-split accounting, not a second
    // pass over the fact table.
    assert(read.get < deltaRows + 100,
      s"refresh read ${read.get} records for a $deltaRows-row delta " +
        s"($total total)")

    // And the combine is the one-pass rollup, value for value.
    import graft.Canon.sig6
    val onePass = src.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum($"q").as("qty"),
        sig6(sum($"l_extendedprice")).as("rev"),
        sig6(sum($"l_extendedprice") / count(lit(1))).as("avg_rev"),
        max($"d").as("last_ship"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(refreshed.nonEmpty)
    refreshed.foreach { r =>
      assert(onePass(r.getString(0)) == r.toSeq.tail, r.toString)
    }
  }
}
