package graft

import org.apache.spark.sql.SparkSession

/** The library's canonical session builder: one place that encodes the
  * configuration this engine is designed for, so every entry point (user
  * code, Verify, Bench, the CLI) runs under identical, scale-appropriate
  * settings instead of re-deriving them.
  *
  * - AQE on (default in Spark 4) with skew-join handling — the derived data
  *   is skewed by construction (BASELINE.md: 98% of soc-LiveJournal1
  *   vertices in the lowest degree bucket), and AQE re-plans at runtime.
  * - `graft.functions.GraftExtensions` injected: `array_dot`, `cosine_sim`,
  *   `srp_sig`, `minhash_sig`, `simhash_sig`, `array_sum_agg` resolve in
  *   SQL text, not just the Scala DSL.
  * - UTC session timezone: oracle comparisons are timezone-free, and
  *   casting the parquet TIMESTAMP_NTZ columns (events.ts, o_orderdate,
  *   l_shipdate) to an instant is the same wall-clock→epoch mapping
  *   DuckDB's `epoch_ms` applies.
  * - Shuffle partitions default to the core count for local runs; a cluster
  *   deployment overrides via `--conf` (the loops size themselves DOWN from
  *   this cap via [[graft.engine.LoopConf]], never up).
  */
object GraftSession {

  /** The configuration this engine ships with — one map, exposed so tests
    * can pin it (a builder is not introspectable; a dropped conf here would
    * otherwise be invisible to the suite).
    */
  def baseConfs(shufflePartitions: Int): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // Whole-stage-codegen class cache (static conf, default 100 entries):
    // a multi-query workload generates thousands of codegen classes, and a
    // 100-entry LRU evicts a compiled class long before the same plan
    // shape recurs — every recurrence then pays a full Janino compile.
    // 4096 entries keeps the working set of a few-hundred-query session
    // resident; the entries are compiled classes (metadata, not data), so
    // the sizing is scale-independent.
    "spark.sql.codegen.cache.maxEntries" -> "4096",
    "spark.ui.enabled" -> "false")

  def builder(master: String = s"local[${defaultCores}]",
              shufflePartitions: Int = defaultCores): SparkSession.Builder =
    baseConfs(shufflePartitions).foldLeft(
      SparkSession.builder()
        .master(master)
        .withExtensions(new functions.GraftExtensions()(_))) {
      case (b, (k, v)) => b.config(k, v)
    }

  def defaultCores: Int =
    math.min(32, Runtime.getRuntime.availableProcessors())
}
