package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver test data (TESTDATA.md).
  *
  * All queries receive an `sfDir` (e.g. /root/testdata/sf0.01) holding one
  * parquet file per table. Reads are plain `spark.read.parquet` so Catalyst
  * gets full pushdown/pruning: the scan node should show PushedFilters and a
  * pruned ReadSchema for every query that filters/projects.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
