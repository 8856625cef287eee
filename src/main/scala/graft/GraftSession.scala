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
  * - `nanosAsLong` for the TIMESTAMP(NANOS) events table (TESTDATA.md).
  * - UTC session timezone: oracle comparisons are timezone-free.
  * - Shuffle partitions default to the core count for local runs; a cluster
  *   deployment overrides via `--conf` (the loops size themselves DOWN from
  *   this cap via [[graft.engine.LoopConf]], never up).
  */
object GraftSession {

  def builder(master: String = s"local[${defaultCores}]",
              shufflePartitions: Int = defaultCores): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new functions.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")

  def defaultCores: Int =
    math.min(32, Runtime.getRuntime.availableProcessors())
}
