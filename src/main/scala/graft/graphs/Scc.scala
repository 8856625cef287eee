package graft.graphs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algos.Algorithms
import graft.engine.{GmrRunner, GraphMeta}

/** Strongly connected components THROUGH THE ENGINE — the FW-BW-coloring
  * algorithm (Orzan's coloring / forward-backward family) driver-orchestrated
  * over two [[graft.engine.GmrAlgorithm]] fixpoints per peel round:
  *
  *   1. forward max-color ([[Algorithms.FwdMaxColor]]): color(v) = max id
  *      reaching v. Every color class has exactly one root (color(r) = r),
  *      and SCC(r) ⊆ its color class.
  *   2. backward reach within the color class: transpose the color-matched
  *      edge subgraph, add a virtual source with an edge to every root, and
  *      run plain [[Algorithms.Sssp]] — finite distance ⟺ the vertex reaches
  *      its own color root inside its class ⟺ it is in that root's SCC
  *      (any intermediate vertex of such a path provably carries the same
  *      color, so the restriction is exact).
  *
  * Settled SCCs are labeled min(id) (the g09 oracle's labeling), removed,
  * and the peel repeats. Each round settles every current root's SCC, so
  * rounds ≤ the longest chain of SCCs in the condensation DAG — the known
  * bound of this family; trim-style singleton removal falls out for free
  * because singleton roots settle as 1-vertex SCCs. Everything on the data
  * path is joins + engine runs; per-round state is localCheckpoint-bounded
  * exactly like the inner superstep loops.
  */
object Scc {

  /** SCC labels (id, comp = min id of the component) for the directed graph
    * `edgeDf(src, dst)`.
    */
  def sccEngine(s: SparkSession, edgeDf: DataFrame, maxRounds: Int = 64): DataFrame = {
    import s.implicits._
    val virtualSource = -1L

    var eRem = edgeDf.select($"src", $"dst").distinct().localCheckpoint()
    var vRem = eRem.select($"src".as("id"))
      .union(eRem.select($"dst".as("id"))).distinct().localCheckpoint()
    var result: DataFrame = null
    var round = 0
    var remaining = vRem.count()

    while (remaining > 0 && round < maxRounds) {
      round += 1
      val mRem = eRem.count() // sizes the runner dispatch (local vs shuffled)
      // Phase 1: forward max-color over the remaining subgraph.
      val colors = GmrRunner.auto(s, vRem,
          eRem.withColumn("weight", lit(1.0)),
          Algorithms.FwdMaxColor, GraphMeta(remaining),
          numEdges = mRem)
        .select($"id", $"value".cast("long").as("color"))
        .localCheckpoint()
      // Phase 2: backward reach to the color root, inside the color class.
      val colorOf = colors
      val colorEdges = eRem
        .join(colorOf.as("cs"), $"src" === $"cs.id")
        .join(colorOf.as("cd"), $"dst" === $"cd.id")
        .filter($"cs.color" === $"cd.color")
        .select($"src", $"dst")
      val roots = colors.filter($"id" === $"color").select($"id")
      val bwdEdges = colorEdges
        .select($"dst".as("src"), $"src".as("dst")) // transpose
        .union(roots.select(lit(virtualSource).as("src"), $"id".as("dst")))
        .withColumn("weight", lit(1.0))
      val bwdVerts = vRem.union(s.range(1).select(lit(virtualSource).as("id")))
      val reach = GmrRunner.auto(s, bwdVerts, bwdEdges, Algorithms.Sssp,
        GraphMeta(remaining + 1, source = virtualSource), numEdges = mRem + 1)
      val settled = reach
        .filter($"value" =!= Double.PositiveInfinity && $"id" =!= virtualSource)
        .select($"id")
        .join(colors, "id")
      // g09 labeling: comp = min id of the SCC (color is the max id).
      val comp = settled.groupBy($"color").agg(min($"id").as("comp"))
      val labeled = settled.join(comp, "color").select($"id", $"comp")
      result =
        (if (result == null) labeled else result.union(labeled)).localCheckpoint()
      vRem = vRem.join(labeled.select($"id"), Seq("id"), "left_anti")
        .localCheckpoint()
      eRem = eRem
        .join(vRem.select($"id".as("src")), Seq("src"), "left_semi")
        .join(vRem.select($"id".as("dst")), Seq("dst"), "left_semi")
        .select($"src", $"dst")
        .localCheckpoint()
      remaining = vRem.count()
    }
    require(remaining == 0, s"SCC peel did not converge in $maxRounds rounds")
    result
  }
}
