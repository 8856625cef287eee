package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the correctness gate compares by NAME, so a
  * key drift between `queries` and `oracleSql` silently downgrades a query
  * to rows-only (or orphans an oracle entirely). Pinned here instead of
  * discovered in a round report.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle has a query; no orphaned oracle keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names follow the prefix_name convention") {
    val bad = SparkEntry.queries.keySet.filterNot(
      _.matches("^[bglmqs][0-9]{2}_[a-z0-9_]+$"))
    assert(bad.isEmpty, s"nonconforming names: $bad")
  }

  test("no duplicate query ids across modules") {
    val ids = SparkEntry.queries.keySet.toSeq.map(_.take(3))
    val dups = ids.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate ids: $dups")
  }

  test("deliberately oracle-less queries are a closed, documented set") {
    // Anything new without an oracle must be added here CONSCIOUSLY (the
    // driver records only a weak rows-only check for these).
    // The 64M generators use Spark's xxhash64; a bit-exact DuckDB port
    // exists (XXH64 via HUGEINT split-multiply mod-2^64 arithmetic,
    // validated value-for-value) but measures ~230 s for 8M hashes
    // alone — an order of magnitude past gate budget. The 8M anchors
    // (b02/b08) escaped this in round 10 by switching their generator to
    // an md5-derived edge rule DuckDB reproduces natively, and now carry
    // real oracles; at 64M even the md5 mirror (regeneration + a
    // recursive CTE over 8× the edges and ~4× the depth-state) is an
    // order of magnitude past budget, so the 64M five stay golden-pinned.
    val expectedRowsOnly = Set(
      "b03_sssp_rand64m",   // 64M-edge distributed-tier anchor (CTE oracle
                            // infeasible at 64M — see note above;
                            // forced through SqlRunner past the 32M threshold;
                            // self-pinned: the query REQUIREs its depth
                            // histogram against a recorded golden)
      "b04_sssp_skew64m",   // 64M-edge POWER-LAW-skew anchor (EngineSpec pins
                            // salted-vs-local equality at 200k on the same
                            // shape; self-pinned like b03)
      "b05_pagerank_skew64m", // fixed-2-round PageRank on the skewed graph —
                            // full-relation superstep throughput under skew
      "b06_sssp_graphx64m", // b03's graph through GraphXRunner, REQUIRE-
                            // pinned against b03's own depth golden — the
                            // cross-runner equality pin at the real 64M
                            // tier (same CTE-infeasibility rationale)
      "b07_pagerank_conv64m" // converged PageRank (d=0.5 parity, ε=1e-4)
                            // at 64M; self-pinned via the changed-count
                            // trace golden
      // q12/q52 left this set in round 10: the queries now emit their
      // tolerance VERDICT (estimate vs in-aggregate exact twin) and the
      // oracle asserts it — the approximate aggregates are hash-gated.
    )
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == expectedRowsOnly,
      s"unexpected rows-only: ${actual -- expectedRowsOnly}; " +
        s"now oracle-checked (remove from list): ${expectedRowsOnly -- actual}")
  }
}
