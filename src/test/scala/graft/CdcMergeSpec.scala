package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcMerge

/** Direct tests of the shared CDC merge primitive — q61 and s10 both gate
  * it end to end, but only on batches with one change per key; these pin
  * the documented DUPLICATE-key collapse semantics (any D wins, U deltas
  * sum, order-independent) that the gate paths never exercise.
  */
class CdcMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def state(rows: (Long, String, Double)*) =
    rows.toDF("key", "c_name", "c_acctbal")

  private def got(st: org.apache.spark.sql.DataFrame,
                  ch: org.apache.spark.sql.DataFrame) =
    CdcMerge.apply(st, ch).as[(Long, String, Double)].collect()
      .map { case (k, n, b) => (k, n, math.rint(b * 100) / 100) }.toSet

  test("duplicate-key batch: U and D on one key -> delete wins") {
    val st = state((1L, "a", 10.0), (2L, "b", 20.0))
    val ch = CdcMerge.updates(st.filter($"key" === 1), 5.0)
      .unionByName(CdcMerge.deletes(st.filter($"key" === 1)))
    assert(got(st, ch) == Set((2L, "b", 20.0)))
  }

  test("duplicate-key batch: U deltas sum; D wins regardless of position") {
    val st = state((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    val u1 = CdcMerge.updates(st.filter($"key" === 1), 5.0)
    val u2 = CdcMerge.updates(st.filter($"key" === 1), 7.0)
    val d2 = CdcMerge.deletes(st.filter($"key" === 2))
    val u2b = CdcMerge.updates(st.filter($"key" === 2), 100.0)
    // Two orders of the same multiset must agree (deltas compose).
    val chA = u1.unionByName(u2).unionByName(d2).unionByName(u2b)
    val chB = u2b.unionByName(d2).unionByName(u2).unionByName(u1)
    val want = Set((1L, "a", 22.0), (3L, "c", 30.0))
    assert(got(st, chA) == want)
    assert(got(st, chB) == want)
  }

  test("randomized dup-key batches match a driver-side reference") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 5) {
      val n = 20
      val base = (1L to n).map(k => (k, s"n$k", rnd.nextInt(100).toDouble))
      val st = state(base: _*)
      // Random multiset of matched changes, ~2 per key, duplicates common.
      val changes = Seq.fill(2 * n.toInt) {
        val k = 1L + rnd.nextInt(n.toInt)
        if (rnd.nextDouble() < 0.3) ("D", k, 0.0)
        else ("U", k, rnd.nextInt(20).toDouble)
      }
      val chDf = changes.map { case (op, k, d) =>
        (k, op, Option.empty[String], if (op == "U") Some(d) else None)
      }.toDF("key", "op", "new_name", "delta")
      // Reference: D anywhere kills the key; else balance += sum of U.
      val dead = changes.collect { case ("D", k, _) => k }.toSet
      val delta = changes.collect { case ("U", k, d) => (k, d) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val want = base.collect {
        case (k, nm, b) if !dead(k) =>
          (k, nm, b + delta.getOrElse(k, 0.0))
      }.toSet
      assert(got(st, chDf) == want)
    }
  }
}
