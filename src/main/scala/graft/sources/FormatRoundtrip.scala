package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Canon.{sig6, sig6Sql}
import graft.Tables

/** Source/sink certification beyond parquet: each query writes a projection
  * of `lineitem` out in a text or columnar format, reads it back through the
  * corresponding Spark source, and aggregates. The oracle computes the same
  * aggregate straight from the parquet table — hash equality proves the
  * round trip was lossless (CSV/JSON double round-trips are exact because
  * Spark renders doubles with the shortest-round-trip representation).
  *
  * The reference's only format is its text graph file (partition.h:183-513,
  * covered by GraphSource); these cover the formats a 100 TB lakehouse
  * deployment actually ingests. Reads use an explicit schema — schema
  * inference is an extra full scan that is never acceptable at scale.
  */
object FormatRoundtrip {

  /** Scratch dir keyed by (process, sf name, format): the pid segment keeps
    * concurrent JVMs (a Verify and a Bench run, say) from overwriting each
    * other's round-trip data mid-read; the sf segment isolates scale
    * factors within one JVM.
    */
  private def recursiveDelete(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(recursiveDelete)
    f.delete(): Unit
  }

  /** This JVM's scratch root is swept once at exit, and dead-pid roots from
    * crashed JVMs are swept on first use — the per-call UUID dirs below
    * would otherwise accumulate in /tmp without bound across bench rounds.
    */
  /** Delete pid-keyed roots under `base` whose owning process is gone —
    * shared by the lazy init below and its spec.
    */
  private[sources] def sweepDeadPidRoots(base: java.io.File): Unit =
    Option(base.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case s if s.startsWith("p") && s.length > 1 &&
          s.drop(1).forall(_.isDigit) &&
          ProcessHandle.of(s.drop(1).toLong).isEmpty => recursiveDelete(f)
        case _ => ()
      }
    }

  private lazy val scratchRoot: java.io.File = {
    val base = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_roundtrip")
    val mine = new java.io.File(base, s"p${ProcessHandle.current().pid()}")
    sweepDeadPidRoots(base)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      recursiveDelete(mine)))
    mine
  }

  private def scratch(sfDir: String, fmt: String): String = {
    val sf = new java.io.File(sfDir).getName
    // Per-call UUID: every scratch dir is write-then-read within ONE query
    // invocation, and two concurrent same-process runs of the same query
    // (Verify's thread pool re-entering, a dev double-submit) must not
    // overwrite the directory the other is still reading. Bounded: the
    // JVM's whole root dies with the JVM (shutdown hook above).
    val run = java.util.UUID.randomUUID().toString.take(8)
    s"$scratchRoot/$sf/${fmt}_$run"
  }

  /** Delete q59 bucket-table directories whose owning pid is gone. Only
    * dead-pid dirs are touched, so concurrent live JVMs sharing the
    * warehouse keep their isolation; this JVM's own tables are reused via
    * overwrite mode.
    */
  private def cleanupStaleBucketTables(s: SparkSession): Unit = {
    val whConf = s.conf.get("spark.sql.warehouse.dir")
    val whUri = java.net.URI.create(whConf)
    val wh = new java.io.File(
      if (whUri.getScheme == null) whConf else whUri.getPath)
    val pat = "b59_[a-z]+_p([0-9]+)_.*".r
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    Option(wh.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case pat(pid) if ProcessHandle.of(pid.toLong).isEmpty => rm(f)
        case _ => ()
      }
    }
  }

  /** Write lineitem's date-consumer projection range-partitioned AND
    * sorted on l_shipdate: every parquet row group then covers a narrow,
    * disjoint date slice, so footer min/max statistics let a date-range
    * scan skip everything outside the predicate. One sort key needs no
    * space-filling curve — this is the single-dimension case of
    * Z-ordering, and the third at-rest layout lever beside q59's
    * bucketing and the hive-partitioned directory pruning.
    *
    * The key is stored as DATE, not timestamp: every l_shipdate is
    * midnight (BucketingSpec pins this), DATE is the natural warehouse
    * sort key — and, measured on this Spark build, a TIMESTAMP_NTZ key's
    * pushed range filters do NOT engage row-group stats pruning (6000/6000
    * rows read) while the identical DATE predicate prunes to the one
    * intersecting file (690/6000). The layout key type is load-bearing.
    */
  private[graft] def sortedLayout(s: SparkSession, dir: String): String = {
    import s.implicits._
    val out = scratch(dir, "sorted60")
    Tables.load(s, dir, "lineitem")
      .select(to_date($"l_shipdate").as("l_sdate"), $"l_returnflag",
        $"l_extendedprice")
      .repartitionByRange(8, $"l_sdate")
      .sortWithinPartitions($"l_sdate")
      .write.mode("overwrite").parquet(out)
    out
  }

  private def projection(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_quantity" > 45)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice", $"l_returnflag")
  }

  private def summarize(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sig6(sum($"l_extendedprice")).as("rev"),
        sig6(sum($"l_quantity")).as("qty"),
        max($"l_orderkey").as("max_key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_csv_roundtrip" -> ((s, dir) => {
      val out = scratch(dir, "csv")
      val proj = projection(s, dir)
      proj.write.mode("overwrite").option("header", "true").csv(out)
      summarize(s.read.schema(proj.schema).option("header", "true").csv(out))
    }),
    "q47_json_roundtrip" -> ((s, dir) => {
      val out = scratch(dir, "json")
      val proj = projection(s, dir)
      proj.write.mode("overwrite").json(out)
      summarize(s.read.schema(proj.schema).json(out))
    }),
    "q48_orc_roundtrip" -> ((s, dir) => {
      val out = scratch(dir, "orc")
      val proj = projection(s, dir)
      proj.write.mode("overwrite").orc(out)
      summarize(s.read.orc(out))
    }),
    // The at-rest CO-LOCATION lever behind the oracle gate: both fact
    // tables written bucketed on the join key, read back, and joined —
    // the bucketed scan replaces the join's shuffle (pay the shuffle once
    // at write time; every later fact⋈fact join on that key is
    // exchange-free — THE posture for repeated 100 TB joins).
    // Correctness: the oracle states the plain join over the parquet
    // truth, so hash equality proves the bucketed layout is
    // semantics-free. The plan property is pinned in PlanAuditSpec (with
    // broadcast disabled, the join side plans no exchange and scans
    // report `Bucketed: true`); table names carry (pid, sf) so concurrent
    // Verify/Bench JVMs sharing ./spark-warehouse cannot collide.
    "q59_bucketed_join" -> ((s, dir) => {
      import s.implicits._
      // Full identifier sanitization (any non-alphanumeric, not just the
      // dot — a hyphenated dir basename would otherwise emit unparseable
      // SQL), and a warehouse sweep of table dirs left by DEAD pids: the
      // pid-keyed names that isolate concurrent JVMs also defeat DROP IF
      // EXISTS across runs (each fresh in-memory catalog starts empty),
      // so without the sweep every run leaks two bucketed fact copies.
      val sf = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val pid = ProcessHandle.current().pid()
      cleanupStaleBucketTables(s)
      val to = s"b59_orders_p${pid}_$sf"
      val tl = s"b59_lineitem_p${pid}_$sf"
      s.sql(s"DROP TABLE IF EXISTS $to")
      s.sql(s"DROP TABLE IF EXISTS $tl")
      Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(to)
      Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_extendedprice", $"l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(tl)
      s.table(tl).join(s.table(to), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          sig6(sum($"l_extendedprice" * $"l_quantity")).as("volume"))
    }),
    // The SORT-ORDER layout lever behind the oracle gate: a date-range
    // consumer over the [[sortedLayout]] copy. The pushed predicate prunes
    // at the row-group level via footer min/max (BucketingSpec measures
    // recordsRead collapsing versus an unsorted copy of the same rows);
    // the oracle states the identical filter over the unsorted parquet
    // truth, so hash equality proves the layout is semantics-free.
    "q60_sort_skipping" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(sortedLayout(s, dir))
        .filter($"l_sdate" >= lit("1996-01-01").cast("date") &&
          $"l_sdate" < lit("1996-04-01").cast("date"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          sig6(sum($"l_extendedprice")).as("rev"))
    }),
  )

  /** One oracle body: the formats must all reproduce the parquet truth. */
  private val oracle =
    s"""SELECT l_returnflag, count(*) AS cnt,
       |       ${sig6Sql("sum(l_extendedprice)")} AS rev,
       |       ${sig6Sql("sum(l_quantity)")} AS qty,
       |       max(l_orderkey) AS max_key
       |FROM lineitem WHERE l_quantity > 45
       |GROUP BY l_returnflag""".stripMargin

  val oracles: Map[String, String] = Map(
    "q46_csv_roundtrip" -> oracle,
    "q47_json_roundtrip" -> oracle,
    "q48_orc_roundtrip" -> oracle,
    // The plain join over the parquet truth — bucketing must not change
    // a single row.
    "q59_bucketed_join" ->
      s"""SELECT o_orderpriority, count(*) AS cnt,
         |       ${sig6Sql("sum(l_extendedprice * l_quantity)")} AS volume
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority""".stripMargin,
    // Same filter over the unsorted truth — sort-skipping must not move
    // a single row.
    "q60_sort_skipping" ->
      s"""SELECT l_returnflag, count(*) AS cnt,
         |       ${sig6Sql("sum(l_extendedprice)")} AS rev
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'
         |GROUP BY l_returnflag""".stripMargin,
  )
}
