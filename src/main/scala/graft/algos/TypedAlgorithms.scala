package graft.algos

import graft.engine.{GraphMeta, TypedGmrAlgorithm}

/** Algorithms on the engine's typed tier ([[graft.engine.TypedRunner]]) —
  * the ones whose state or messages don't fit the scalar-Double algebra of
  * [[graft.engine.GmrAlgorithm]].
  */
object TypedAlgorithms {

  /** SSSP on the typed tier — scalar state, so it ALSO fits the fast tier;
    * it exists here as the cross-tier equality certificate (TypedEngineSpec
    * pins TypedRunner == SqlRunner == LocalRunner on the same graphs).
    */
  object Sssp extends TypedGmrAlgorithm[Double, Double] {
    val name = "sssp-typed"
    def init(id: Long, adj: Array[Long], meta: GraphMeta): Double =
      if (id == meta.source) 0.0 else Double.PositiveInfinity
    def send(iter: Int, id: Long, value: Double, adjDst: Array[Long],
             adjW: Array[Double], meta: GraphMeta): Iterator[(Long, Double)] =
      if (java.lang.Double.isInfinite(value)) Iterator.empty
      else adjDst.iterator.zip(adjW.iterator).map { case (d, w) => d -> (value + w) }
    def merge(a: Double, b: Double): Double = math.min(a, b)
    def update(iter: Int, id: Long, oldVal: Double, msg: Option[Double],
               meta: GraphMeta): Double =
      msg.fold(oldVal)(m => math.min(oldVal, m))
    // Exact comparison: hop/weight sums are exact doubles, and == avoids
    // the |inf − inf| = NaN hazard entirely.
    def changed(oldVal: Double, newVal: Double): Boolean = oldVal != newVal
  }

  /** Per-vertex triangle count with the triangle credited to its MIDDLE
    * vertex (a < b < c → b) — the reference's list-payload algorithm shape:
    * TriangleCount ships whole adjacency lists as messages
    * (algorithms.h:134-166); state is a composite (own higher-adjacency,
    * count) pair. Two fixed phases, algoIterNum-style (gmr.h:111):
    *
    *   round 1: every vertex a sends to each higher neighbor b the list
    *            {c ∈ adj(a) : c > b} — the candidate third vertices;
    *   round 1 update at b: count = Σ |candidates ∩ {c ∈ adj(b) : c > b}|;
    *   round 2: nothing sends (iter-gated), nothing changes → converged.
    *
    * Input must be the SYMMETRIZED edge relation (each undirected edge in
    * both directions); the higher-neighbor filter restores the a<b<c
    * orientation locally.
    */
  /** r12 note (VERDICT item 6, measured and REJECTED): flattening the
    * message type to Seq[Long] (candidates concatenated) was tried for a
    * cheaper encoder and measured g18 6.7 → 12.0 s on the same box/cores —
    * the nested form's merge concatenates the OUTER spine only (inner
    * lists shared by reference), while the flat form's reduceGroups fold
    * re-copies every accumulated element per merge: O(k·L) on hub
    * vertices. The nested encoding stays.
    */
  object TrianglesPerMidVertex
      extends TypedGmrAlgorithm[(Seq[Long], Long), Seq[Seq[Long]]] {
    val name = "triangles-typed"
    override def maxIter: Int = 2
    def init(id: Long, adj: Array[Long], meta: GraphMeta): (Seq[Long], Long) =
      (adj.filter(_ > id).sorted.toSeq, 0L)
    def send(iter: Int, id: Long, value: (Seq[Long], Long),
             adjDst: Array[Long], adjW: Array[Double], meta: GraphMeta)
        : Iterator[(Long, Seq[Seq[Long]])] =
      if (iter != 1) Iterator.empty
      else {
        val higher = value._1
        higher.iterator.map { b =>
          b -> Seq(higher.filter(_ > b))
        }.filter(_._2.head.nonEmpty)
      }
    def merge(a: Seq[Seq[Long]], b: Seq[Seq[Long]]): Seq[Seq[Long]] = a ++ b
    def update(iter: Int, id: Long, oldVal: (Seq[Long], Long),
               msg: Option[Seq[Seq[Long]]], meta: GraphMeta): (Seq[Long], Long) =
      msg.fold(oldVal) { lists =>
        val own = oldVal._1.toSet
        (oldVal._1, lists.iterator.map(_.count(own)).sum.toLong)
      }
    def changed(oldVal: (Seq[Long], Long), newVal: (Seq[Long], Long)): Boolean =
      oldVal._2 != newVal._2
  }
}
