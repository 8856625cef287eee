package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the reference's graph text formats (O1, SURVEY §2.1).
  *
  * GMR adjacency format (parser semantics from partition.h:81-153,183-273):
  * two header lines (|V|, |E| as directed records), then one `from to` edge
  * per line with any non-digit separator; blank lines and `#` comments
  * skipped; files using 0-based ids are detected (a vertex id 0 present) and
  * shifted +1; gaps in the id space are isolated vertices — the vertex set is
  * always exactly 1..|V| (partition.h:232-255 gap-fill).
  *
  * The parse is distributed (edge lines don't depend on position); only the
  * 2-line header is read driver-side via `take`, so a 100 TB edge file scans
  * in parallel.
  */
object GraphSource {

  final case class GmrGraph(numVertices: Long, numEdges: Long,
                            vertices: DataFrame, edges: DataFrame)

  /** Read a GMR-format graph. Edge weights default to 1.0 (the format has
    * none; SSSP overwrites them anyway, algorithms.h:17-18).
    */
  def readGmrText(spark: SparkSession, path: String): GmrGraph = {
    import spark.implicits._
    val meaningful = spark.sparkContext.textFile(path)
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
    val header = meaningful.take(2).map(_.split("[^0-9]+").head.toLong)
    val (nV, nE) = (header(0), header(1))

    // Cached: the zero-based probe below materializes the parse in parallel
    // once; every downstream consumer (runner pack, counts) reads the
    // cached rows instead of re-parsing the text. The cache intentionally
    // lives for the session (consumers are lazy, so there is no safe point
    // to unpersist here); footprint is one parsed edge list per distinct
    // graph file, and batch drivers (Bench) clear caches between queries.
    val pairs = meaningful.flatMap { l =>
      val ns = l.split("[^0-9]+").filter(_.nonEmpty)
      if (ns.length >= 2) Some((ns(0).toLong, ns(1).toLong)) else None
    }.toDF("src", "dst").cache()

    val zeroBased = pairs.agg(min(least($"src", $"dst")).as("m"))
      .first().getLong(0) == 0L
    val shifted =
      if (zeroBased) pairs.select(($"src" + 1).as("src"), ($"dst" + 1).as("dst"))
      else pairs
    val edges = shifted.withColumn("weight", lit(1.0))
    val vertices = spark.range(1, nV + 1).select($"id")
    GmrGraph(nV, nE, vertices, edges)
  }

  /** Raw edge list (no header, `from to` per line — README.md:57-59's second
    * accepted format). Vertex set = ids appearing in edges.
    */
  def readEdgeList(spark: SparkSession, path: String): GmrGraph = {
    import spark.implicits._
    val pairs = spark.sparkContext.textFile(path)
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        val ns = l.split("[^0-9]+").filter(_.nonEmpty)
        if (ns.length >= 2) Some((ns(0).toLong, ns(1).toLong)) else None
      }.toDF("src", "dst").cache() // parse once: counts + consumers share it
    val edges = pairs.withColumn("weight", lit(1.0))
    val vertices = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct()
    GmrGraph(vertices.count(), edges.count(), vertices, edges)
  }
}
