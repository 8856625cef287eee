package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink-side scale posture: results written partitioned-by-key support
  * partition pruning on read-back (a filtered scan touches only matching
  * directories), and bucketed tables support shuffle-free joins
  * (BucketingSpec). Together these are the "pay the shuffle once at write
  * time" story for 100 TB pipelines.
  */
class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitionBy write prunes partitions on filtered read-back") {
    import spark.implicits._
    val out = TestSpark.tempDir("graft_sink")
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val kinds = spark.read.parquet(out).select($"event_type").distinct()
      .as[String].collect().sorted
    assert(kinds.length >= 3, s"expected several event types, got ${kinds.toSeq}")

    val one = spark.read.parquet(out).filter($"event_type" === kinds.head)
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    // The filter must be resolved at the directory level, not per-row.
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // And the scan should read only the one matching directory.
    val scannedFiles = one.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles.toInt
      }.getOrElse(-1)
    val allFiles = spark.read.parquet(out)
      .queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles.toInt
      }.getOrElse(-1)
    assert(scannedFiles > 0 && allFiles > scannedFiles,
      s"pruning ineffective: $scannedFiles of $allFiles files")
  }
}
