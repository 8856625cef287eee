package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** K-means over the `embeddings` table — the reference's declared-intent
  * `Kmeans` stub (algorithms.h:227-265, a placeholder with a copied PageRank
  * body) done for real, as Lloyd iterations in the DataFrame engine:
  *
  *   assign: cross join points × broadcast(centroids), argmin distance
  *           (min_by over a tiny broadcast side — no shuffle of the points)
  *   update: ONE groupBy(cluster) with the ArraySumAgg elementwise-sum
  *           sketch (k×dim partial sums shuffled per partition), then a
  *           per-element divide by the cluster size
  *
  * Deterministic: seeds = the k lowest vec_ids, fixed iteration count.
  */
object KMeans {

  /** @return (vec_id, cluster) assignment after `iters` Lloyd rounds. */
  def fit(s: SparkSession, dir: String, k: Int = 8, iters: Int = 5): DataFrame =
    fitWithCentroids(s, dir, k, iters)._2

  /** Lloyd iterations returning BOTH the trained centroids `(cluster, c)`
    * and the assignment `(vec_id, cluster)` — the coarse-quantizer API the
    * IVF similarity index builds on.
    *
    * Cross-engine determinism (the l14 oracle): every quantity whose value
    * depends on FLOAT SUMMATION ORDER is rounded to the shared
    * 9-significant-digit grid ([[graft.Canon.sig6]]) before it influences
    * a decision — the per-round centroid means (partial-aggregated sums
    * merge in engine-specific order) and the assignment distances (dot
    * products of grid-rounded centroids). Ulp noise collapses onto one
    * grid point, so DuckDB's statically unrolled Lloyd (see
    * [[lloydOracle]]) lands the identical clustering, while the
    * clustering itself is perturbed by at most 1e-9 relative — noise far
    * below the data's scale.
    */
  def fitWithCentroids(s: SparkSession, dir: String, k: Int = 8,
                       iters: Int = 5): (DataFrame, DataFrame) = {
    import s.implicits._
    fitOn(s, graft.Tables.load(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v")),
      k, iters)
  }

  /** [[fitWithCentroids]] over an arbitrary `(vec_id, v: array<double>)`
    * frame — the per-subspace codebook training the product quantizer
    * (l55) runs four times on sliced subvectors through the SAME Lloyd so
    * the codebooks cannot drift from l14's semantics.
    */
  private[graft] def fitOn(s: SparkSession, points0: DataFrame, k: Int,
                           iters: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    val points = points0.cache()
    // Size the per-round argmin shuffle to the data (a 64-dim double vector
    // row is ~0.5 KB on the wire); the count also materializes the cache.
    val nPoints = points.count()

    // dist²(a,b) = |a|² - 2a·b + |b|²; only -2a·b + |b|² varies per centroid.
    // The vector rides through the argmin aggregation so the centroid
    // update needs no join back to the points.
    def assign(centroids: DataFrame): DataFrame =
      points.crossJoin(broadcast(centroids))
        .withColumn("d2",
          graft.Canon.sig6(GraftFunctions.arrayDot(s, $"c", $"c") -
            lit(2.0) * GraftFunctions.arrayDot(s, $"v", $"c")))
        .groupBy($"vec_id")
        .agg(min_by($"cluster", struct($"d2", $"cluster")).as("cluster"),
          first($"v").as("v"))

    graft.engine.LoopConf.withShuffleParts(s,
        graft.engine.LoopConf.sizedParallelism(s, nPoints, 520)) {
      var centroids = points.orderBy($"vec_id").limit(k)
        .select($"vec_id".cast("int").as("cluster"), $"v".as("c"))
        .localCheckpoint()

      var it = 0
      while (it < iters) {
        it += 1
        // Centroid update = ONE aggregation: the ArraySumAgg sketch sums
        // vectors elementwise with map-side partials (k×dim doubles shuffled
        // per partition), replacing the posexplode → per-dimension avg →
        // re-assembly pipeline (rows×dim exploded rows, three shuffles).
        centroids = assign(centroids)
          .groupBy($"cluster")
          .agg(GraftFunctions.arraySumAgg(s, $"v").as("sv"),
            count(lit(1)).as("n"))
          .select($"cluster",
            transform($"sv", x => graft.Canon.sig6(x / $"n")).as("c"))
          .localCheckpoint()
      }
      val out = assign(centroids).select($"vec_id", $"cluster")
      points.unpersist()
      (centroids, out)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Oracle-checked since round 5: Lloyd is iterative, but 5 fixed rounds
    // unroll statically ([[lloydOracle]]), and the sig6 grid (see
    // fitWithCentroids) makes every decision quantity cross-engine
    // identical. KMeansSpec additionally pins determinism + structure.
    "l14_kmeans" -> ((s, dir) => {
      import s.implicits._
      fit(s, dir).groupBy($"cluster").agg(count(lit(1)).as("n_points"))
    }),
  )

  /** DuckDB oracle for l14: Lloyd statically unrolled. Round r: assign by
    * `row_number() OVER (PARTITION BY point ORDER BY d2, cluster)` — the
    * same (sig6 d2, smallest cluster) argmin as the Spark side, with d2 =
    * |c|² − 2·v·c via `list_inner_product` on identical doubles — then
    * recompute per-cluster elementwise means on the sig6 grid. Cluster
    * labels are the k lowest vec_ids (the seeds), like the Spark side.
    */
  private def lloydOracle(k: Int, iters: Int, dim: Int): String = {
    val (ctes, fin) = lloydAssignCtes(k, iters, dim)
    s"""WITH $ctes
       |SELECT cluster, count(*) AS n_points
       |FROM $fin GROUP BY cluster""".stripMargin
  }

  /** The unrolled-Lloyd CTE prefix (seeds, `iters` assign+update rounds, a
    * final assignment) WITHOUT the `WITH` keyword or a closing SELECT, plus
    * the name of the final assignment relation `(vec_id, cluster, v)` —
    * shared between the l14 oracle above and oracles that consume the
    * trained clustering (l34 semantic dedup).
    */
  private[graft] def lloydAssignCtes(k: Int, iters: Int, dim: Int): (String, String) = {
    val base =
      s"""pts AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings)""".stripMargin
    val (chain, fin, _) = lloydCtesOver("pts", "", k, iters, dim)
    (s"""$base,
        |$chain""".stripMargin, fin)
  }

  /** The Lloyd CTE chain over an EXISTING `(vec_id, v)` relation `ptsRel`,
    * all CTE names prefixed with `pfx` so several chains (the l55 product
    * quantizer trains one per subspace) coexist in one statement.
    * @return (CTE text, final-assignment name, final-centroid name)
    */
  private[graft] def lloydCtesOver(ptsRel: String, pfx: String, k: Int,
                                   iters: Int, dim: Int)
      : (String, String, String) = {
    val sig = graft.Canon.sig6Sql _
    val d2 = "list_inner_product(c.c, c.c) - 2*list_inner_product(p.v, c.c)"
    val seed =
      s"""${pfx}c0 AS (SELECT CAST(vec_id AS INT) AS cluster, v AS c
         |       FROM $ptsRel ORDER BY vec_id LIMIT $k)""".stripMargin
    def assignCte(r: Int, prev: String): String =
      s"""${pfx}a$r AS MATERIALIZED (
         |  SELECT vec_id, cluster, v FROM (
         |    SELECT p.vec_id, c.cluster, p.v,
         |           row_number() OVER (PARTITION BY p.vec_id
         |             ORDER BY ${sig(d2)}, c.cluster) AS rn
         |    FROM $ptsRel p, $prev c) t
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${assignCte(r, s"${pfx}c${r - 1}")},
         |${pfx}c$r AS MATERIALIZED (
         |  SELECT cluster, list(m ORDER BY i) AS c FROM (
         |    SELECT cluster, i, ${sig("sum(v[i]) / count(*)")} AS m
         |    FROM ${pfx}a$r, unnest(generate_series(1, $dim)) t(i)
         |    GROUP BY cluster, i) g
         |  GROUP BY cluster)""".stripMargin
    }.mkString(",\n")
    (s"""$seed,
        |$rounds,
        |${assignCte(iters + 1, s"${pfx}c$iters")}""".stripMargin,
      s"${pfx}a${iters + 1}", s"${pfx}c$iters")
  }

  val oracles: Map[String, String] = Map(
    "l14_kmeans" -> lloydOracle(k = 8, iters = 5, dim = 64),
  )
}
