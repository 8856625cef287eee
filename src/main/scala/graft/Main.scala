package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algos.Algorithms
import graft.engine.{GmrRunner, GraphMeta}
import graft.graphs.GraphOps
import graft.sources.GraphSource

/** CLI mirroring the reference's entry point (`igmr [algorithm] [partitions]
  * [graphfile]`, igmr.cpp:89-102 via startgmr.sh:14): a user of the
  * reference runs the same three algorithms by name on the same graph
  * files. Output follows the reference's printResult shapes (O14):
  * SSSP prints `path_len(<src>, <v>):<d>` per reached vertex
  * (algorithms.h:62-67), TriangleCount prints the global count
  * (algorithms.h:189-194), PageRank prints a completion summary (the
  * reference's PageRank has no result printer, algorithms.h:111).
  */
object Main {

  /** Run one named algorithm; returns the result frame (also printed). */
  def run(spark: SparkSession, algo: String, graphFile: String): DataFrame = {
    import spark.implicits._
    algo.toLowerCase match {
      case "sssp" =>
        GmrRunner.autoFile(spark, graphFile, Algorithms.Sssp,
            n => GraphMeta(n, source = 1L))
          .filter($"value" =!= Double.PositiveInfinity)
          .select($"id", $"value".cast("long").as("dist"))
      case "trianglecount" =>
        val g = GraphSource.readGmrText(spark, graphFile)
        GraphOps.triangleCount(spark, g.edges.select($"src", $"dst"))
      case "pagerank" =>
        // Reference-parity constants: d = 0.5 (README.md:112-113); global-N
        // damping (the reference's per-partition n is a documented artifact
        // of its partitioning, SURVEY §2.2).
        GmrRunner.autoFile(spark, graphFile, Algorithms.PageRank(0.5),
            n => GraphMeta(n))
          .select($"id", $"value".as("rank"))
      case other =>
        throw new IllegalArgumentException(
          s"unknown algorithm '$other' (expected pagerank|trianglecount|sssp)")
    }
  }

  def main(args: Array[String]): Unit = {
    // Arg order mirrors the reference CLI; the partition-count argument is
    // accepted for compatibility but Spark's planner sizes partitions.
    val algo = args.headOption.getOrElse("trianglecount")
    val graphFile = args.lift(2).orElse(args.lift(1))
      .filter(a => !a.forall(_.isDigit))
      .getOrElse("/root/reference/graph/small.graph")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = run(spark, algo, graphFile)
    algo.toLowerCase match {
      case "sssp" =>
        // One buffered write: a println per vertex pays a per-line flush
        // through the build tool's output pump (measured ~2 ms/line —
        // 30+ s for 4elt's 15k rows against 0.3 s of actual compute).
        val sb = new StringBuilder
        out.orderBy("id").collect()
          .foreach(r => sb.append("path_len(1, ").append(r.getLong(0))
            .append("):").append(r.getLong(1)).append('\n'))
        print(sb)
      case "trianglecount" =>
        println(s"triangles: ${out.head().getLong(0)}")
      case _ =>
        println(s"pagerank: ${out.count()} vertices converged")
    }
    println(f"total: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
