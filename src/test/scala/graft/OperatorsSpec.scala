package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, SkewJoin}

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join == plain join (skewed fixture)") {
    import spark.implicits._
    // 10k rows of one hot key + a tail, joined against a 3-row dim.
    val large = spark.range(10000)
      .select((when($"id" % 10 === 0, 1L).otherwise($"id" % 3)).as("k"),
        $"id".as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "dim")
    val plain = large.join(small, Seq("k"), "inner")
      .select($"k", $"payload", $"dim").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInner(large, small, "k", salts = 8,
        saltSource = Seq($"payload"))
      .select($"k", $"payload", $"dim").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 10000)
  }

  test("as-of join picks latest right row at-or-before, ties by tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (2L, 100L, 5L), (3L, 101L, 99L))
      .toDF("eid", "k", "t")
    val right = Seq((100L, 5L, 50L), (100L, 5L, 51L), (100L, 9L, 60L), (101L, 98L, 70L))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.backward(left, right,
        leftKey = left("k"), rightKey = right("rk"),
        leftTime = left("t"), rightTime = right("rt"),
        rightTieBreak = right("payload"), rightCols = Seq("payload"))
      .select($"eid", $"payload").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // eid=1 (t=10): latest right at rt<=10 is rt=9 → payload 60.
    // eid=2 (t=5): two right rows at rt=5 → tiebreak takes payload 51.
    // eid=3 (t=99): right at rt=98 → payload 70.
    assert(out == Map(1L -> 60L, 2L -> 51L, 3L -> 70L))
  }

  test("as-of join carries NULL right columns as-is (no stitching across rows)") {
    import spark.implicits._
    // Right rows: at rt=5 payload=(a, 1); at rt=9 payload=(NULL, 2). A left
    // row at t=10 must carry (NULL, 2) — the matching row's actual values —
    // not resurrect 'a' from the older row.
    val left = Seq((1L, 100L, 10L)).toDF("eid", "k", "t")
    val right = Seq((100L, 5L, Some("a"), 1L), (100L, 9L, None, 2L))
      .toDF("rk", "rt", "tag", "seq")
    val out = AsOfJoin.backward(left, right,
        leftKey = left("k"), rightKey = right("rk"),
        leftTime = left("t"), rightTime = right("rt"),
        rightTieBreak = right("seq"), rightCols = Seq("tag", "seq"))
      .select($"eid", $"tag", $"seq").collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(1), "NULL tag from the matched row must survive")
    assert(out(0).getLong(2) == 2L)
  }

  test("pre-partitioned join reuses partitioning (no extra exchange)") {
    import spark.implicits._
    val a = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("x"))
      .repartition(8, $"k")
    val b = spark.range(1000).select($"id".as("k"), ($"id" * 3).as("y"))
      .repartition(8, $"k")
    val joined = a.join(b, "k")
    val plan = joined.queryExecution.executedPlan.toString
    // The two explicit repartitions are the ONLY exchanges: the join reuses
    // their partitioning instead of inserting its own.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$plan")
    assert(joined.count() == 1000)
  }

  test("q52 approx percentiles land within the sketch's RANK tolerance") {
    // Since round 10 the query itself carries the rank-tolerance check
    // (estimate vs exact ±0.02-rank envelope, emitted as per-group
    // within_tol verdicts that the DuckDB oracle asserts). This spec pins
    // the same contract at sf0.001 — every group's verdicts must be true.
    val rows = SparkEntry.queries("q52_approx_percentile")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2),
        s"${r.getString(0)}: verdicts ${r.getBoolean(1)}/${r.getBoolean(2)}")
    }
  }
}
