package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  private[graft] def recursiveDelete(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(recursiveDelete)
    f.delete(): Unit
  }

  /** Roots older than this are reclaimed even when their pid number maps
    * to a live process: the OS recycles pids, so a crashed JVM's root can
    * masquerade as live forever — the age gate bounds that worst case.
    * (A genuinely live 3-day JVM losing its root only costs a re-run of
    * an in-flight round trip; the per-call dirs are minutes-lived.)
    */
  private[sources] val DeadRootMaxAgeMs = 3L * 24 * 3600 * 1000

  /** Delete pid-keyed roots under `base` whose owning process is gone —
    * shared by the lazy init below and its spec. Liveness is pid presence
    * OR-ed with the [[DeadRootMaxAgeMs]] age gate (recycled-pid hazard).
    */
  private[sources] def sweepDeadPidRoots(base: java.io.File): Unit =
    Option(base.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case s if s.startsWith("p") && s.length > 1 &&
          s.drop(1).forall(_.isDigit) &&
          (ProcessHandle.of(s.drop(1).toLong).isEmpty ||
            System.currentTimeMillis() - f.lastModified() > DeadRootMaxAgeMs) =>
          recursiveDelete(f)
        case _ => ()
      }
    }

  /** This JVM's scratch root: swept once at exit by the shutdown hook;
    * dead-pid/aged roots from other JVMs are swept on first use.
    */
  private lazy val scratchRoot: java.io.File = {
    val base = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_roundtrip")
    val mine = new java.io.File(base, s"p${ProcessHandle.current().pid()}")
    sweepDeadPidRoots(base)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      recursiveDelete(mine)))
    mine
  }

  /** Same-key scratch dirs older than this are swept on the next call for
    * that key: long-lived JVMs (interactive sbt, repeated Bench/Verify
    * iterations) would otherwise accumulate one lineitem-scale copy per
    * invocation until exit. Minutes, not seconds — a returned DataFrame is
    * read lazily and a sibling run must not delete a dir the caller is
    * still consuming; no production query holds a scratch read open
    * anywhere near this long.
    */
  private[sources] val ScratchMaxAgeMs = 15L * 60 * 1000

  private[graft] def scratch(sfDir: String, fmt: String): String = {
    val sf = new java.io.File(sfDir).getName
    val parent = new java.io.File(scratchRoot, sf)
    // Keep the pid root's mtime fresh on every use: new run dirs touch
    // only the <sf> subdir, so without this a live multi-day JVM's root
    // would read as stale to another JVM's DeadRootMaxAgeMs sweep.
    scratchRoot.setLastModified(System.currentTimeMillis()): Unit
    // Age-gated same-key sweep (see ScratchMaxAgeMs) — bounds in-JVM
    // growth; the shutdown hook and dead-pid sweep bound cross-JVM growth.
    Option(parent.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith(s"${fmt}_") &&
          System.currentTimeMillis() - f.lastModified() > ScratchMaxAgeMs)
        recursiveDelete(f)
    }
    // Per-call UUID: every scratch dir is write-then-read within ONE query
    // invocation, and two concurrent same-process runs of the same query
    // (Verify's thread pool re-entering, a dev double-submit) must not
    // overwrite the directory the other is still reading.
    val run = java.util.UUID.randomUUID().toString.take(8)
    s"$parent/${fmt}_$run"
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

  /** Morton/Z-value: interleave the low `bits` bits of two non-negative
    * long columns — bit i of `a` lands at position 2i+1, of `b` at 2i.
    * Plain long shift/mask arithmetic, whole-stage-codegen'd end to end;
    * no UDF.
    */
  private[graft] def mortonZ(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Z-ORDERED layout: lineitem's (ship date × quantity) projection
    * clustered along a 2-D Morton curve, the multi-dimension
    * generalization of [[sortedLayout]]'s single sort key (what
    * Delta/Iceberg call OPTIMIZE ZORDER). Range-partitioning + sorting by
    * the interleaved z-value makes every row group cover a small
    * RECTANGLE of the (date, qty) plane, so parquet footer min/max
    * statistics prune scans filtered on EITHER dimension alone — a 1-D
    * sort key can only ever serve its leading column.
    *
    * Grid coordinates come from a LINEAR [min, max] → 8-bit cell mapping
    * computed in one cheap min/max aggregate pass — NOT from a
    * corpus-wide rank (a global window sort is the anti-pattern at
    * 100 TB; for a skewed dimension the cell fences would come from
    * approxQuantile's sampled quantiles instead — same shape, still no
    * global sort). Both dimensions get the SAME cell width so neither
    * dominates the curve's high bits. The z column is dropped before the
    * write: it exists to ORDER the rows, the pruning works off the data
    * columns' own footer stats.
    */
  private[graft] def zorderLayout(s: SparkSession, dir: String): String = {
    import s.implicits._
    val out = scratch(dir, "zorder65")
    val base = Tables.load(s, dir, "lineitem")
      .select(to_date($"l_shipdate").as("l_sdate"),
        // Quantities are integer-valued (TPC-H 1..50); the long cast is
        // exact and gives the grid integer arithmetic.
        $"l_quantity".cast("long").as("l_qty"),
        $"l_returnflag", $"l_extendedprice")
    val bounds = base.agg(min($"l_sdate"), max($"l_sdate"),
      min($"l_qty"), max($"l_qty")).head()
    val (d0, d1) = (bounds.getDate(0), bounds.getDate(1))
    val (q0, q1) = (bounds.getLong(2), bounds.getLong(3))
    val dSpan = math.max(1L,
      d1.toLocalDate.toEpochDay - d0.toLocalDate.toEpochDay + 1)
    val qSpan = math.max(1L, q1 - q0 + 1)
    val cells = 256L // 8 bits per dimension, 16-bit z
    // x in [0, span) → cell floor(x*256/span) in [0, 255]. The division
    // is double-typed but exact at the edges: both operands are integers
    // far below 2^53, so an integer-valued quotient rounds to itself and
    // floor never slips a cell boundary.
    val dCell = datediff($"l_sdate", lit(d0.toString).cast("date"))
      .cast("long") * cells / lit(dSpan)
    val qCell = ($"l_qty" - lit(q0)) * cells / lit(qSpan)
    base
      .withColumn("z",
        mortonZ(floor(dCell).cast("long"), floor(qCell).cast("long"), 8))
      .repartitionByRange(8, $"z")
      .sortWithinPartitions($"z")
      .drop("z")
      .write.mode("overwrite").parquet(out)
    out
  }

  /** q66's date cutoff: rows strictly before it are "history" (aggregated
    * once at build time), the rest is the newly-arrived delta slice.
    */
  private[graft] val MvCutoff = "2001-01-01"

  private[graft] def mvSource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .select($"l_returnflag", to_date($"l_shipdate").as("d"),
        $"l_quantity".cast("long").as("q"), $"l_extendedprice")
  }

  /** RAW algebraic partials (no rounding — rounding a stored partial would
    * bake the build's split point into the refreshed result).
    */
  private def mvPartial(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum($"q").as("qty"),
        sum($"l_extendedprice").as("rev_raw"), max($"d").as("last_ship"))
  }

  /** One-time materialized-view build: history aggregated once, stored at
    * rest. Returns the view's path.
    */
  private[graft] def mvBuild(s: SparkSession, dir: String): String = {
    import s.implicits._
    val mv = scratch(dir, "mv66")
    mvPartial(mvSource(s, dir).filter($"d" < lit(MvCutoff).cast("date")))
      .write.mode("overwrite").parquet(mv)
    mv
  }

  /** The refresh: the caller hands in the DELTA (an ingest job knows its
    * new rows — it never re-derives them by filtering the full table),
    * which is aggregated and combined with the stored partials —
    * count/sum combine by sum, max by max, avg derives from the combined
    * sum/count (never combined directly, the classic incremental-view
    * pitfall). History is never rescanned: with the fact table
    * date-partitioned (the production layout for an incremental fact),
    * the delta scan directory-prunes to the new slice —
    * IncrementalAggSpec measures recordsRead during the refresh staying
    * at delta size on exactly that layout.
    */
  private[graft] def mvRefresh(s: SparkSession, mvPath: String,
                               delta: DataFrame): DataFrame = {
    import s.implicits._
    s.read.parquet(mvPath)
      .unionByName(mvPartial(delta))
      .groupBy($"l_returnflag")
      .agg(sum($"cnt").as("cnt"), sum($"qty").as("qty"),
        sig6(sum($"rev_raw")).as("rev"),
        sig6(sum($"rev_raw") / sum($"cnt")).as("avg_rev"),
        max($"last_ship").as("last_ship"))
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
    // SMALL-FILE COMPACTION — the lakehouse maintenance op (OPTIMIZE):
    // streaming/incremental ingest leaves a table as thousands of tiny
    // files whose per-file open/footer cost dominates scans at 100 TB.
    // Compact = read fragmented layout, repartition to ceil(bytes /
    // target) output files, rewrite. Sized from the MEASURED input (the
    // fragmented files' own on-disk bytes), not a guess — the same
    // stats-driven sizing discipline as LoopConf. The query REQUIREs the
    // file-count collapse (64 -> the computed handful) so the operator
    // cannot silently degrade to a no-op; hash equality against the
    // parquet truth proves the rewrite is semantics-free.
    "q64_compact_files" -> ((s, dir) => {
      import s.implicits._
      val frag = scratch(dir, "frag64")
      projection(s, dir).repartition(64)
        .write.mode("overwrite").parquet(frag)
      // File listing goes through the Hadoop FileSystem API — the same
      // abstraction Spark itself scans through — so the operator is
      // correct on HDFS/S3 layouts, not just file:// (java.io.File would
      // silently see nothing on a remote store).
      def files(p: String): Array[org.apache.hadoop.fs.FileStatus] = {
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(path).filter(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet"))
      }
      val fragFiles = files(frag)
      val targetBytes = 32L * 1024 * 1024
      val nOut = math.max(1,
        math.ceil(fragFiles.map(_.getLen).sum.toDouble / targetBytes).toInt)
      val compact = scratch(dir, "compact")
      s.read.parquet(frag).repartition(nOut)
        .write.mode("overwrite").parquet(compact)
      val nCompact = files(compact).length
      require(nCompact == nOut && nCompact < fragFiles.length,
        s"compaction did not collapse the layout: ${fragFiles.length} " +
          s"fragments -> $nCompact files (wanted $nOut)")
      summarize(s.read.parquet(compact))
    }),
    // DIRECTORY-PARTITIONED layout behind the oracle gate — the first leg
    // of the partition/bucket/sort at-rest trilogy finally gated like its
    // siblings (BucketingSpec measures the file-count pruning; the query
    // itself REQUIREs the predicate landing in PartitionFilters so the
    // gate also pins the plan shape). A one-event-type consumer reads only
    // that directory's files, decided at planning time from the listing,
    // before any row or footer I/O — the coarsest and cheapest skip level.
    "q67_hive_pruning" -> ((s, dir) => {
      import s.implicits._
      val out = scratch(dir, "hive67")
      Tables.load(s, dir, "events")
        .select($"event_id", $"user_id", $"value", $"event_type")
        .write.partitionBy("event_type").mode("overwrite").parquet(out)
      val scan = s.read.parquet(out).filter($"event_type" === "purchase")
      // Structural gate, not plan-text matching (render formats drift
      // across Spark versions): walk to the file scans (through AQE
      // wrappers if present) and assert the predicate landed in
      // partitionFilters — planning-time directory pruning, before any
      // row or footer I/O.
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans)
      }
      val pruned = scans(scan.queryExecution.executedPlan)
      require(pruned.nonEmpty && pruned.forall(_.partitionFilters
          .exists(_.references.exists(_.name == "event_type"))),
        "partition predicate did not reach the scan's partitionFilters:\n" +
          scan.queryExecution.executedPlan.toString)
      scan.groupBy(($"user_id" % 10).as("bucket"))
        .agg(count(lit(1)).as("cnt"), sig6(sum($"value")).as("sum_val"))
    }),
    // INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view refresh
    // op ([[mvBuild]]/[[mvRefresh]]): a 100 TB fact table's rollup is
    // never recomputed from history; stored raw partials combine with an
    // aggregate over ONLY the newly-arrived slice. The double sums
    // reassociate (base + delta vs one pass) exactly as Spark's own
    // partial aggregation does — sig6 at the END absorbs it, the same
    // discipline as every other oracle. The oracle recomputes the rollup
    // from the full parquet truth, so hash equality proves the delta path
    // loses nothing.
    "q66_incremental_agg" -> ((s, dir) => {
      import s.implicits._
      val mv = mvBuild(s, dir)
      mvRefresh(s, mv,
        mvSource(s, dir).filter($"d" >= lit(MvCutoff).cast("date")))
    }),
    // The MULTI-dimension layout lever behind the oracle gate: a
    // two-predicate consumer over the [[zorderLayout]] copy. Each pushed
    // predicate prunes row groups through that dimension's OWN footer
    // min/max (BucketingSpec measures recordsRead collapsing for a
    // date-only AND a quantity-only filter versus an unsorted copy of
    // the same rows); the oracle states the identical filter over the
    // unclustered parquet truth, so hash equality proves the curve
    // reorders, never rewrites.
    "q65_zorder_scan" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(zorderLayout(s, dir))
        .filter($"l_sdate" >= lit("1996-01-01").cast("date") &&
          $"l_sdate" < lit("1996-07-01").cast("date") && $"l_qty" > 40)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          sig6(sum($"l_extendedprice")).as("rev"),
          sum($"l_qty").as("qty"))
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
    // Compaction must not move a single row either.
    "q64_compact_files" -> oracle,
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
    // The same one-type rollup over the unpartitioned truth — the
    // directory layout must not move a single row.
    "q67_hive_pruning" ->
      s"""SELECT user_id % 10 AS bucket, CAST(count(*) AS BIGINT) AS cnt,
         |       ${sig6Sql("sum(value)")} AS sum_val
         |FROM events WHERE event_type = 'purchase'
         |GROUP BY user_id % 10""".stripMargin,
    // The full-history rollup restated from the parquet truth — the
    // base+delta combine must reproduce it exactly (counts/sums/max are
    // exact; the double sums land within sig6 of the one-pass sum).
    "q66_incremental_agg" ->
      s"""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
         |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         |       ${sig6Sql("sum(l_extendedprice)")} AS rev,
         |       ${sig6Sql("sum(l_extendedprice) / count(*)")} AS avg_rev,
         |       max(CAST(l_shipdate AS DATE)) AS last_ship
         |FROM lineitem
         |GROUP BY l_returnflag""".stripMargin,
    // Same two predicates over the unclustered truth — the Z-order curve
    // must not move a single row either. The quantity long cast is exact
    // (integer-valued doubles) and CAST to BIGINT keeps the summed dtype
    // integral on both engines.
    "q65_zorder_scan" ->
      s"""SELECT l_returnflag, count(*) AS cnt,
         |       ${sig6Sql("sum(l_extendedprice)")} AS rev,
         |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1996-07-01'
         |  AND l_quantity > 40
         |GROUP BY l_returnflag""".stripMargin,
  )
}
