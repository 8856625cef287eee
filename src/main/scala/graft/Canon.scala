package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical rounding for cross-engine float comparison.
  *
  * The correctness gate renders floats at 6 significant digits (FIXTURES.md
  * §5). Two engines summing the same doubles in different orders differ by
  * ~1 ulp, which flips the 6th significant digit whenever the true value
  * sits on a rounding boundary — a knife-edge failure unrelated to
  * correctness. Queries whose float outputs come from order-dependent
  * aggregation therefore round to NINE significant digits *inside the
  * query*, with the identical formula on the Spark and oracle side. Why 9
  * and not 6: ulp-level noise collapses onto one shared 9-sig double (the
  * noise would have to land within 1e-10 relative of a 9-sig half-grid
  * point to flip — and values that are exact short decimals, the common
  * pathological case, sit ON 9-sig grid points, not on their boundaries).
  * Once both engines hold the identical double, the gate's 6-sig rendering
  * is trivially equal.
  */
object Canon {

  /** Round to 9 significant digits (0 stays 0). */
  def sig6(c: Column): Column = {
    val scale = pow(lit(10.0), lit(8.0) - floor(log10(abs(c))))
    when(c === 0.0, lit(0.0)).otherwise(round(c * scale) / scale)
  }

  /** The same rounding as a SQL fragment for the DuckDB oracles. */
  def sig6Sql(e: String): String =
    s"CASE WHEN ($e) = 0 THEN 0.0 ELSE " +
      s"round(($e) * power(10, 8 - floor(log10(abs($e))))) / " +
      s"power(10, 8 - floor(log10(abs($e)))) END"
}
