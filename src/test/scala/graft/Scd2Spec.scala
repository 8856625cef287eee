package graft

import org.scalatest.funsuite.AnyFunSuite

/** q68's structural invariants, checked directly (the oracle hash-checks
  * the full relation; these pin WHY it holds): per entity the version
  * intervals chain gaplessly, exactly one row is current, and the current
  * row is the latest version.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scd2 merge: per-entity intervals chain, exactly one current row") {
    val rows = SparkEntry.queries("q68_scd2_merge")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val perUser = rows.groupBy(_.getLong(0))
    perUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getTimestamp(2).getTime)
      // [valid_from, valid_to) intervals chain with no gap or overlap.
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(3) == b.getTimestamp(2),
            s"user $u: ${a.getTimestamp(3)} != ${b.getTimestamp(2)}")
        case _ => ()
      }
      // Exactly one current version — the last — with an open interval;
      // every other row is closed.
      sorted.init.foreach { r =>
        assert(!r.getBoolean(6) && r.getTimestamp(3) != null, s"user $u")
      }
      val last = sorted.last
      assert(last.getBoolean(6) && last.isNullAt(3), s"user $u")
    }
    // Every version of every entity survives the merge: row count equals
    // the event count (SCD2 keeps history, q61-style overwrite does not).
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(rows.length.toLong == events.count())
  }
}
