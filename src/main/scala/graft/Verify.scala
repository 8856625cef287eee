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
  *
  * Robustness posture (the gate is only as good as its worst run):
  *  - oracle_sql.json is written BEFORE any query runs, so a dump killed
  *    mid-flight (time budget, OOM) still leaves every completed query
  *    checkable instead of zeroing the round.
  *  - the 64M-edge synthetic anchors (b02–b07) run SEQUENTIALLY after the
  *    pooled rest: four of them stacked on the 4-worker pool hold several
  *    GB of graph state EACH, which OOMs a default-heap (8g) driver —
  *    measured on this host (b06+g06+l05+q01 concurrently → heap OOM →
  *    context shutdown → every remaining query "fails"). Serialized, the
  *    peak is one anchor's working set, and the cheap 160+ queries are
  *    already banked by the time the expensive tail starts.
  */
object Verify {

  /** The multi-GB synthetic-anchor family (b01 rides along: it is tiny,
    * and keeping the rule name-shaped means a new b-series anchor cannot
    * be silently pooled — any digit count, so a future b10 doesn't slip
    * back onto the pool).
    */
  private def isHeavy(name: String): Boolean = name.matches("b\\d+_.*")

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
    val unknown = subset -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — a typo here " +
        "would otherwise dump nothing and read as a clean gate pass")
    val selected = if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(subset).toMap

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

    def runOne(name: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val session = spark.newSession()
      try fn(session, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch {
        // Fatal errors (OutOfMemoryError etc.) rethrow: after an anchor OOM
        // kills the SparkContext, swallowing it would let every remaining
        // query log a one-line failure and the process still exit 0 — a
        // dead-context run must be distinguishable from per-query failures
        // (the r7 gate loss was exactly this shape).
        case e: Throwable if scala.util.control.NonFatal(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }

    val (heavy, light) = selected.toSeq.partition(p => isHeavy(p._1))
    val pool = Executors.newFixedThreadPool(math.min(4, cpus))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val runs = light.map { case (name, fn) => Future(runOne(name, fn)) }
    Await.result(Future.sequence(runs), Duration.Inf)
    pool.shutdown()
    // One sweep between the pooled phase and the heavy anchors: the pooled
    // queries release their own cache ENTRIES, but plans executed after a
    // lazy unpersist re-materialize blocks that otherwise sit in the block
    // manager until the first anchor's post-run sweep.
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    heavy.sortBy(_._1).foreach { case (name, fn) =>
      runOne(name, fn)
      // Anchor runners free their own loop state eagerly; sweep whatever
      // residue is left so the next anchor starts from a clean block
      // manager. Two registries need clearing: the DataFrame cache (a
      // generator .cache()) AND the RDD-level persists that
      // localCheckpoint() pins (invisible to cacheManager — the result
      // dumps are already on disk, so nothing can still need them).
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // (The round-9 q12/q52 tolerance sidecar is retired: since round 10
    // those queries compute their exact twin in the same aggregate and
    // emit the tolerance verdict, which their DuckDB oracles assert — the
    // bound is hash-gated by the driver itself, no sidecar needed.)
    // A stopped context here means some query killed it (executor loss,
    // fatal error on a pool thread that a library wrapped non-fatally):
    // the dump is incomplete in a way per-query stderr lines don't convey,
    // so the exit status must say so.
    if (spark.sparkContext.isStopped) {
      System.err.println("[verify] SparkContext is stopped — dump incomplete")
      sys.exit(1)
    }
    spark.stop()
  }
}
