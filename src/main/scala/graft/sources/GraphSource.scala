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

  // Per-path 0-based-ids memo — file metadata, like Spark's own FileIndex
  // caching. The probe is a full-scan min(), so memoizing it removes one
  // job per re-read of the same (static) graph file; the latency-bound
  // small-graph path then runs a single job end-to-end.
  private val zeroBasedCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Read a GMR-format graph. Edge weights default to 1.0 (the format has
    * none; SSSP overwrites them anyway, algorithms.h:17-18).
    */
  def readGmrText(spark: SparkSession, path: String): GmrGraph = {
    import spark.implicits._
    val meaningful = spark.sparkContext.textFile(path)
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
    // Header: 2 lines, read driver-side when the file is on local disk (the
    // reference's rank-0 does the same, partition.h:183) — saves a whole
    // Spark job on the latency-bound small-graph path. Remote URIs fall
    // back to a distributed take(2).
    val (nV, nE) = readHeaderLocally(path).getOrElse {
      val h = meaningful.take(2).map(_.split("[^0-9]+").head.toLong)
      (h(0), h(1))
    }

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

    val zeroBased = zeroBasedCache.computeIfAbsent(path, _ =>
      pairs.agg(min(least($"src", $"dst")).as("m"))
        .first().getLong(0) == 0L).booleanValue()
    val shifted =
      if (zeroBased) pairs.select(($"src" + 1).as("src"), ($"dst" + 1).as("dst"))
      else pairs
    val edges = shifted.withColumn("weight", lit(1.0))
    val vertices = spark.range(1, nV + 1).select($"id")
    GmrGraph(nV, nE, vertices, edges)
  }

  /** First two meaningful lines' leading integers, if `path` is a plain
    * local file. Reads at most a few KB; never loads the file.
    */
  private def readHeaderLocally(path: String): Option[(Long, Long)] = {
    val p = if (path.startsWith("file:")) path.stripPrefix("file:") else path
    if (p.contains("://")) return None
    val f = new java.io.File(p)
    if (!f.isFile) return None
    val src = scala.io.Source.fromFile(f)
    try {
      val it = src.getLines().map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(_.split("[^0-9]+").head.toLong)
      if (it.hasNext) {
        val a = it.next()
        if (it.hasNext) Some((a, it.next())) else None
      } else None
    } catch { case _: Exception => None }
    finally src.close()
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
