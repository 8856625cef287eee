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
    // The b0x generators use Spark's xxhash64; a bit-exact DuckDB port
    // exists (XXH64 via HUGEINT split-multiply mod-2^64 arithmetic,
    // validated value-for-value) but measures ~230 s for b02's 8M hashes
    // alone — an order of magnitude past gate budget, before the 8M-edge
    // recursive-CTE BFS. Measured, not assumed: these four stay rows-only.
    val expectedRowsOnly = Set(
      "b02_sssp_rand8m",    // 8M-edge synthetic anchor (CTE oracle infeasible;
                            // EngineSpec pins runner equality at 200k)
      "b03_sssp_rand64m",   // 64M-edge distributed-tier anchor (same rationale;
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
      "b07_pagerank_conv64m", // converged PageRank (d=0.5 parity, ε=1e-4)
                            // at 64M; self-pinned via the changed-count
                            // trace golden
      "b08_triangles_8m",   // 8M-edge TriangleCount anchor (same
                            // xxhash64-generator CTE-infeasibility
                            // rationale as b02); self-pinned: the query
                            // REQUIREs the global triangle total against
                            // a recorded golden, and g02/g07/g18 oracle-
                            // gate the same plan at sf scale
      "q12_approx_distinct", // approximate by design; numerically
                            // tolerance-checked (5% rel err vs exact
                            // distincts) by tools/oracle_check.py's
                            // APPROX_CHECKS mirror pass AND by Verify's
                            // in-process tolerance_pass.json sidecar
                            // (same bounds, recorded beside the dumps)
      "q52_approx_percentile" // approximate by design (OperatorsSpec rank
                            // bound; oracle_check.py additionally pins
                            // each estimate inside DuckDB's exact ±0.02
                            // rank envelope, and Verify's
                            // tolerance_pass.json sidecar records the
                            // same envelope check in the gate artifacts)
    )
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == expectedRowsOnly,
      s"unexpected rows-only: ${actual -- expectedRowsOnly}; " +
        s"now oracle-checked (remove from list): ${expectedRowsOnly -- actual}")
  }
}
