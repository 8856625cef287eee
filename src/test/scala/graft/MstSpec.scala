package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graphs.Mst

class MstSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Borůvka picks the unique MST on a hand graph") {
    import spark.implicits._
    // Square 1-2-3-4 with diagonals; distinct weights; MST = {12, 23, 34}.
    val e = Seq(
      (1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 4L, 3.0), (1L, 4L, 4.0), (1L, 3L, 5.0)
    ).toDF("a", "b", "w")
    val mst = Mst.boruvka(spark, e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mst == Set((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 4L, 3.0)))
  }

  test("disconnected input yields a spanning forest") {
    import spark.implicits._
    val e = Seq(
      (1L, 2L, 1.0), (2L, 3L, 2.0), // component A
      (10L, 11L, 4.0), (11L, 12L, 5.0), (10L, 12L, 6.0) // component B (triangle)
    ).toDF("a", "b", "w")
    val mst = Mst.boruvka(spark, e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mst == Set((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)))
  }
}
