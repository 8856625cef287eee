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

  /** Order-independent EXACT sum of a value that is an exact decimal with
    * `dec` fractional digits (money columns are 2dp; price×(1−disc)
    * products are 4dp): scale each term to integer units, sum as LONG
    * (associative, engine/order-independent), divide once. The result is
    * the bit-identical double on every engine, so no sig-digit grid is
    * needed at all. sig6's 9-sig rounding is NOT safe for these sums:
    * an exact-decimal sum ≥ ~5·10^8·quantum lands exactly ON 9-sig
    * half-grid points with probability ~quantum/grid, and two engines
    * summing in different orders then round to different grid points
    * (the q76/q78 round-10 driver-gate failure).
    *
    * Term scaling is exact: each term is an exact decimal, so term*10^dec
    * is within ~1 ulp of an integer and round() recovers it exactly.
    * Long range: gate-SF unit sums are ≤ ~1e15, far inside 2^63; at
    * 100 TB swap the LONG for DECIMAL(38,`dec`) — same device, same
    * order-independence (documented in OPTIMIZATION_r11.md).
    */
  def exactSum(c: Column, dec: Int): Column = {
    val s = math.pow(10.0, dec.toDouble)
    sum(round(c * s).cast("long")) / lit(s)
  }

  /** Integer-unit sum (LONG) without the final division — for callers
    * that compare or combine sums exactly before producing a double. */
  def exactSumUnits(c: Column, dec: Int): Column = {
    val s = math.pow(10.0, dec.toDouble)
    sum(round(c * s).cast("long"))
  }

  /** The same exact sum as a SQL fragment for the DuckDB oracles.
    * DuckDB's sum(BIGINT) yields HUGEINT — cast back to BIGINT before
    * the division so the dtype matches Spark's LONG (dtype_audit). */
  def exactSumSql(e: String, dec: Int): String = {
    val s = "1" + ("0" * dec)
    s"(CAST(sum(CAST(round(($e) * $s.0) AS BIGINT)) AS BIGINT) / $s.0)"
  }

  def exactSumUnitsSql(e: String, dec: Int): String = {
    val s = "1" + ("0" * dec)
    s"CAST(sum(CAST(round(($e) * $s.0) AS BIGINT)) AS BIGINT)"
  }
}
