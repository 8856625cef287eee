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
    */
  def fitWithCentroids(s: SparkSession, dir: String, k: Int = 8,
                       iters: Int = 5): (DataFrame, DataFrame) = {
    import s.implicits._
    val points = graft.Tables.load(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .cache()
    // Size the per-round argmin shuffle to the data (a 64-dim double vector
    // row is ~0.5 KB on the wire); the count also materializes the cache.
    val nPoints = points.count()

    // dist²(a,b) = |a|² - 2a·b + |b|²; only -2a·b + |b|² varies per centroid.
    // The vector rides through the argmin aggregation so the centroid
    // update needs no join back to the points.
    def assign(centroids: DataFrame): DataFrame =
      points.crossJoin(broadcast(centroids))
        .withColumn("d2",
          GraftFunctions.arrayDot(s, $"c", $"c") -
            lit(2.0) * GraftFunctions.arrayDot(s, $"v", $"c"))
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
          .select($"cluster", transform($"sv", x => x / $"n").as("c"))
          .localCheckpoint()
      }
      val out = assign(centroids).select($"vec_id", $"cluster")
      points.unpersist()
      (centroids, out)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cluster sizes are stable under any runner; rows-only driver check,
    // determinism + structure asserted in KMeansSpec.
    "l14_kmeans" -> ((s, dir) => {
      import s.implicits._
      fit(s, dir).groupBy($"cluster").agg(count(lit(1)).as("n_points"))
    }),
  )
}
