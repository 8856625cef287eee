package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.algos.KMeans

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("k-means assigns every point, uses <= k clusters, and is deterministic") {
    val a = KMeans.fit(spark, dir, k = 8, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == 500)
    val clusters = a.values.toSet
    assert(clusters.size <= 8 && clusters.forall(c => c >= 0 && c < 500))
    val b = KMeans.fit(spark, dir, k = 8, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }
}
