package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference-CLI facade: same algorithm names, same graph files. */
class MainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val small = "/root/reference/graph/small.graph"

  test("CLI sssp on small.graph reproduces the hand golden") {
    val got = Main.run(spark, "sssp", small)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 1L, 6L -> 2L, 7L -> 2L, 8L -> 2L, 9L -> 2L))
  }

  test("CLI trianglecount on small.graph = 2") {
    assert(Main.run(spark, "trianglecount", small).head().getLong(0) == 2L)
  }

  test("CLI pagerank yields a rank per vertex") {
    val pr = Main.run(spark, "pagerank", small).collect()
    assert(pr.length == 10)
    assert(pr.forall(_.getDouble(1) > 0))
  }

  test("unknown algorithm is rejected") {
    intercept[IllegalArgumentException](Main.run(spark, "bogus", small))
  }
}
