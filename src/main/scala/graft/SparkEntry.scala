package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query registries of each module; every entry in `queries`
  * that is SQL-expressible has a DuckDB oracle in `oracleSql` with identical
  * column aliases (the driver's compare hashes columns by name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.RelationalQueries.queries("q03_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.RelationalQueries.queries ++
      llmops.LlmQueries.queries ++
      graphs.GraphQueries.queries ++
      streaming.EventQueries.queries ++
      multimodal.MultimodalOps.queries ++
      algos.KMeans.queries ++
      graphs.Mst.queries ++
      sources.FormatRoundtrip.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relational.RelationalQueries.oracles ++
      llmops.LlmQueries.oracles ++
      graphs.GraphQueries.oracles ++
      streaming.EventQueries.oracles ++
      multimodal.MultimodalOps.oracles ++
      graphs.Mst.oracles ++
      algos.KMeans.oracles ++
      sources.FormatRoundtrip.oracles
}
