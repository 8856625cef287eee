package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (Spark startup dominates test time). */
object TestSpark {

  /** A temp directory removed recursively at JVM exit — spec fixtures
    * (parquet corpora, partitioned layouts) should allocate through this
    * instead of bare Files.createTempDirectory, which leaks a tree per
    * test run.
    */
  def tempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir.toFile)
    }))
    dir.toString
  }

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** The shared 9-significant-digit grid (Canon.sig6 semantics) used by
  * driver-side test replays — one definition so the specs that validate
  * production paths against independent reimplementations (betweenness,
  * k-center) cannot drift from each other if the grid constant changes.
  * Deliberately NOT a call into Canon: the replays' independence from the
  * code under test is the point.
  */
object Sig9 {
  def apply(x: Double): Double = if (x == 0.0) 0.0 else {
    val sc = math.pow(10.0, 8.0 - math.floor(math.log10(math.abs(x))))
    math.round(x * sc) / sc
  }
}

/** The ONE positional (non-rolling) winnowing reference both DedupSpec and
  * FunctionProperties check the production paths against — the l35 HOF /
  * DuckDB-oracle formulation, kept in a single place so a change to the
  * constants or the tie-break cannot leave one suite testing stale
  * semantics.
  */
object WinnowReference {
  def fingerprints(t: String, k: Int, w: Int): Set[(Long, Long)] = {
    val b = graft.functions.Winnow.B
    val p = graft.functions.Winnow.P
    val n = t.length
    if (n - k + 1 < w) Set.empty
    else {
      val hs = (0 to n - k).map(q =>
        t.substring(q, q + k).foldLeft(0L)((acc, c) => (acc * b + c) % p))
      (0 to hs.size - w).map { st =>
        val (h, negp) = (0 until w).map(i => (hs(st + i), -(st + i))).min
        ((-negp + 1).toLong, h)
      }.toSet
    }
  }
}
