package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Single-task executor for [[GmrAlgorithm]] — the stats-driven small-graph
  * fast path.
  *
  * Iterative vertex programs are latency-bound in any distributed engine: a
  * 69-round BFS costs 69 scheduling round-trips no matter how small the
  * graph. The reference runs such graphs in one process and wins on latency
  * (4elt SSSP: 0.28 s, BASELINE.md). This runner restores that: when the
  * edge set fits one executor's memory, the whole superstep loop runs as ONE
  * `mapPartitions` task over a local CSR, using the exact same scalar hooks
  * as GraphXRunner — so results are bit-identical across all three runners.
  *
  * This is the same physical-strategy philosophy as broadcast-hash-join
  * selection: statistics pick the local plan for small inputs, the shuffle
  * plan ([[SqlRunner]]/[[GraphXRunner]]) at scale. [[GmrRunner.auto]] makes
  * the choice on |E|.
  */
object LocalRunner {

  /** Run `alg` in a single task; returns (id, value). */
  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
          alg: GmrAlgorithm, meta: GraphMeta): DataFrame = {
    import spark.implicits._

    // One DF, one partition: kind 0 = vertex row, kind 1 = edge row.
    // coalesce(1) deliberately collapses the upstream scan into the loop
    // task: at the graph sizes that reach this runner (<= 5M edges) a
    // single-task parse beats a repartition(1) exchange (measured 1.0 s vs
    // 2.4 s warm on 4elt) — the exchange's 32-task scan + shuffle overhead
    // exceeds the parse itself.
    val packed = vertices.select(lit(0).as("kind"), $"id".as("a"),
        lit(0L).as("b"), lit(0.0).as("w"))
      .union(edges.select(lit(1).as("kind"), $"src".as("a"), $"dst".as("b"),
        $"weight".as("w")))
      .coalesce(1)

    packed.mapPartitions { rows =>
      val vertIds = mutable.ArrayBuffer.empty[Long]
      val srcs = mutable.ArrayBuffer.empty[Long]
      val dsts = mutable.ArrayBuffer.empty[Long]
      val wgts = mutable.ArrayBuffer.empty[Double]
      rows.foreach { r =>
        if (r.getInt(0) == 0) vertIds += r.getLong(1)
        else { srcs += r.getLong(1); dsts += r.getLong(2); wgts += r.getDouble(3) }
      }
      val n = vertIds.length
      val idx = new mutable.LongMap[Int](n * 2)
      var i = 0
      while (i < n) { idx(vertIds(i)) = i; i += 1 }

      // CSR over local indices.
      val outdeg = new Array[Int](n)
      val m = srcs.length
      i = 0
      while (i < m) { outdeg(idx(srcs(i))) += 1; i += 1 }
      val xadj = new Array[Int](n + 1)
      i = 0
      while (i < n) { xadj(i + 1) = xadj(i) + outdeg(i); i += 1 }
      val adj = new Array[Int](m)
      val w = new Array[Double](m)
      val fill = xadj.clone()
      i = 0
      while (i < m) {
        val s = idx(srcs(i))
        adj(fill(s)) = idx(dsts(i)); w(fill(s)) = wgts(i); fill(s) += 1
        i += 1
      }

      // Superstep loop with the scalar algebra — same semantics as the
      // distributed runners (active-set send, merge, update, |Δ|>ε).
      val value = Array.tabulate(n)(j => alg.initFn(vertIds(j), meta))
      var changed = Array.fill(n)(true)
      val msg = new Array[Double](n)
      val hasMsg = new Array[Boolean](n)
      var iter = 0
      var changedCount = n.toLong
      while (iter < alg.maxIter && changedCount > 0) {
        iter += 1
        java.util.Arrays.fill(hasMsg, false)
        var u = 0
        while (u < n) {
          if ((!alg.activeMessaging || changed(u)) && alg.sendCondFn(value(u))) {
            var e = xadj(u)
            val end = xadj(u + 1)
            while (e < end) {
              val v = adj(e)
              val mv = alg.msgFn(value(u), w(e), outdeg(u))
              if (hasMsg(v)) msg(v) = alg.mergeFn(msg(v), mv)
              else { msg(v) = mv; hasMsg(v) = true }
              e += 1
            }
          }
          u += 1
        }
        val nextChanged = new Array[Boolean](n)
        changedCount = 0
        u = 0
        while (u < n) {
          val nv = alg.updateFn(value(u), if (hasMsg(u)) Some(msg(u)) else None, meta)
          val delta = math.abs(nv - value(u))
          if (delta > alg.epsilon) { nextChanged(u) = true; changedCount += 1 }
          value(u) = nv
          u += 1
        }
        changed = nextChanged
      }
      (0 until n).iterator.map(j => (vertIds(j), value(j)))
    }.toDF("id", "value")
  }
}

/** Facade that picks the physical runner from graph statistics. */
object GmrRunner {
  /** Below this many edges the single-task local loop wins on latency. */
  val LocalEdgeThreshold: Long = 5_000_000L

  def auto(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
           alg: GmrAlgorithm, meta: GraphMeta, numEdges: Long): DataFrame =
    if (numEdges <= LocalEdgeThreshold)
      LocalRunner.run(spark, vertices, edges, alg, meta)
    else
      SqlRunner.run(spark, vertices, edges, alg, meta)
}
