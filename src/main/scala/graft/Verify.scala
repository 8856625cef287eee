package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run on a small thread pool, each worker on its own
  * `spark.newSession()` — isolated SQLConf (the iterative loops temporarily
  * retune shuffle partitions via LoopConf) and temp views, shared context
  * and block manager. Most of the 90+ queries are sub-second latency-bound
  * jobs that leave the cluster idle between driver round-trips; overlapping
  * them cuts the dump's wall-clock ~4× without touching any query.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // Driver contract: exactly (sfDir, outDir). Any further args are a
    // dev-only subset filter — query names to dump — so a new operator can
    // be gate-checked without re-running the whole registry.
    val Array(sfDir, outDir) = args.take(2)
    val subset = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val pool = Executors.newFixedThreadPool(math.min(4, cpus))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val unknown = subset -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — a typo here " +
        "would otherwise dump nothing and read as a clean gate pass")
    val selected = if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(subset).toMap
    val runs = selected.toSeq.map { case (name, fn) =>
      Future {
        val session = spark.newSession()
        try fn(session, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    Await.result(Future.sequence(runs), Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
