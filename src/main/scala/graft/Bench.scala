package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (metric/value/unit/queries/sf) plus shuffle and
  * spill totals from a task-metrics listener — the O17 instrumentation
  * analogue (the reference logs per-phase ticks and cumulative shuffle
  * bytes, gmr.h:317-334, igmr.cpp:158).
  */
object Bench {

  private final class MetricsListener extends SparkListener {
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val spilled = new AtomicLong
    /** Task-end event count — part of the boundary-stability check: a
      * shuffle-LIGHT query's final tasks move none of the byte counters, so
      * polling bytes alone can declare "settled" while its task-end events
      * (and their max-task durations) are still on the async bus, getting
      * misattributed to the next query.
      */
    val taskEnds = new AtomicLong
    /** Longest single task since the last [[resetMaxTask]] — the straggler
      * signal: a skew-serialized stage shows up here as one task spanning
      * most of the query's wall time (reset per query by the bench loop).
      */
    val maxTaskMs = new AtomicLong
    def resetMaxTask(): Unit = maxTaskMs.set(0)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
      if (t.taskInfo != null)
        maxTaskMs.getAndUpdate(cur => math.max(cur, t.taskInfo.duration))
      taskEnds.incrementAndGet()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      GraftSession.defaultCores.toString).toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      // The sf0.1 parquet files are 10-60 MB: at the default 128 MB split
      // size every scan is ONE task and local[32] idles. 8 MB splits fan the
      // scans out; on a real cluster with 100 TB inputs the default is right,
      // this knob is per-deployment input sizing.
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    // Untimed session warmup, run on the SMALLEST available scale factor:
    // a query's first execution pays whole-stage-codegen compilation + JIT
    // (measured 9.4 s cold vs 1.0 s warm for the shingle pipeline at
    // sf0.1) — a one-time JVM cost the native baseline never pays, and the
    // generated code is identical across scale factors, so compiling it on
    // sf0.001 warms the sfDir run for ~a second per query. q01/q03/l10
    // warm the scan/join/agg shapes, b01 the graph-file path, the l-set
    // the heavy HOF/sketch pipelines.
    val warmDir = {
      val sib = new java.io.File(
        new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.toString else sfDir
    }
    Seq("q01_filter_project", "q03_join_agg", "l10_lang_dist",
        "b01_sssp_4elt", "l03_jaccard_pairs", "l04_minhash_pairs",
        "l12_fingerprints", "l14_kmeans", "l25_neardup_clusters",
        // g06 runs the distributed SqlRunner loop on a tiny graph — warms
        // the superstep join/agg codegen that b03 otherwise pays cold.
        "g06_wcc_engine").foreach { n =>
      try { SparkEntry.queries(n)(spark, warmDir).count(): Unit }
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    System.gc()

    // Single pass. (A warm second pass was tried and measured SLOWER than
    // the cold pass — accumulated session state across 60+ queries costs
    // more than per-query codegen compilation saves — so each query's first
    // run in a fresh-ish session is the honest and the better number.)
    // Distributed-tier anchor sidecars (b03 uniform, b04/b05 skewed):
    // loop seconds + superstep count + skew-handling engagement flags,
    // captured from SqlRunner right after each anchor runs. Throughput is
    // computed below from the EXACT generator edge count (the src≠dst
    // filter drops a handful of the nominal 64M) in BOTH accountings —
    // BASELINE.md's G2 convention |E|×iters/total-wall (69.0M × 15 /
    // 146.5 s ≈ 7.1M/s, log.txt:53-55) and loop-only wall.
    val anchorNames = Set("b03_sssp_rand64m", "b04_sssp_skew64m",
      "b05_pagerank_skew64m", "b07_pagerank_conv64m")
    val anchorStats = scala.collection.mutable.Map
      .empty[String, (Double, Int, Int, Int)]
    // Per-query shuffle deltas (O17: the reference logs cumulative shuffle
    // bytes per phase; here each query's own read/write/spill) — reported in
    // the FILE artifact only, the stdout line must stay under the driver's
    // 4 KB tail capture.
    val perQ = Seq.newBuilder[(String, Double, Double, Double, Double)]
    // Task-end events arrive on an async listener bus: count() returning
    // does not mean the last wave was delivered, and sampling mid-drain
    // misattributes bytes to the NEXT query. Poll until the totals stop
    // moving (typically one 25 ms beat) before reading a boundary.
    def settled(): (Long, Long, Long) = {
      def snap() = (listener.shuffleRead.get, listener.shuffleWrite.get,
        listener.spilled.get, listener.taskEnds.get)
      var cur = snap()
      var tries = 0
      while (tries < 40) {
        Thread.sleep(25)
        val nxt = snap()
        if (nxt == cur) return (cur._1, cur._2, cur._3)
        cur = nxt; tries += 1
      }
      (cur._1, cur._2, cur._3)
    }
    // Dev-only subset runs (variance probes, single-query A/Bs): a
    // comma-separated name list in SPARK_GRAFT_ONLY restricts the loop.
    // The driver never sets it, so artifact runs always cover the full
    // registry; the sidecars below tolerate missing anchors/recall rows.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val (r0, w0, s0) = settled()
      listener.resetMaxTask()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
        false
      }
      if (ok && anchorNames(name))
        anchorStats(name) = (graft.engine.SqlRunner.lastLoopSeconds,
          graft.engine.SqlRunner.lastIterations,
          graft.engine.SqlRunner.lastSaltedHubs,
          graft.engine.SqlRunner.lastSaltFactor)
      // A throwing query reports -1, never a normal-looking duration.
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      val (r1, w1, s1) = settled()
      val mb = 1024.0 * 1024.0
      perQ += ((name, (r1 - r0) / mb, (w1 - w0) / mb, (s1 - s0) / mb,
        listener.maxTaskMs.get / 1000.0))
      // Queries are independent: drop cached relations AND the persisted
      // RDDs that back localCheckpoints (clearCache does not touch those —
      // iterative queries leave one block set per superstep), then let the
      // context cleaner reclaim broadcast residue.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      System.gc()
      name -> dt
    }
    // Headline totals are the QUERY LOOP's alone, snapshotted before the
    // sidecars below run additional Spark jobs (anchor edge counts, recall
    // re-executions) — sampling at JSON-build time would count sidecar
    // shuffle in the benchmark totals and break round-over-round
    // comparability of the observability metrics.
    val (benchRead, benchWrite, benchSpilled) = settled()
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // Failures carry the -1 sentinel per-query but must not subtract from
    // the headline total; a non-zero "failed" count flags them.
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val mb = 1024.0 * 1024.0
    // Exact generator edge counts for the anchors that ran (one cheap
    // shuffle-free range scan each; b04/b05 share a generator) — counted
    // over the SAME shared generator definitions the anchor queries run
    // (GraphQueries.uniformEdges64M/skewEdges64M), so the denominator can
    // never drift from the graph that was measured. ADVICE-r4: throughput
    // must come from the same measured quantities it reports.
    import org.apache.spark.sql.functions._
    lazy val uniformEdges = graphs.GraphQueries.uniformEdges64M(spark).count()
    lazy val skewEdges = graphs.GraphQueries.skewEdges64M(spark).count()
    val anchorExtra = anchorStats.toSeq.sortBy(_._1).map {
      case (name, (loopSec, iters, hubs, saltF)) =>
        val dt = results.toMap.getOrElse(name, -1.0)
        val edges = if (name.contains("skew")) skewEdges else uniformEdges
        val key = name.take(3)
        val eipsTotal = if (dt > 0) edges.toDouble * iters / dt else -1.0
        val eipsLoop = if (loopSec > 0) edges.toDouble * iters / loopSec else -1.0
        f""","${key}_edges":$edges,"${key}_iters":$iters,"${key}_loop_sec":$loopSec%.3f,"${key}_eips_total":$eipsTotal%.0f,"${key}_eips_loop":$eipsLoop%.0f,"${key}_salted_hubs":$hubs,"${key}_salt_factor":$saltF"""
    }.mkString +
      // b02 runs the single-task CSR tier (no SqlRunner sidecar); its round
      // count is implied by the spec-pinned depth golden — recorded here so
      // tools/sync_anchors.py derives throughput from the artifact alone.
      // Subset runs (SPARK_GRAFT_ONLY) omit it: the artifact must not
      // carry rows for queries the loop never ran.
      (if (only.isEmpty)
        s""","b02_iters":${graphs.GraphQueries.goldenRounds(
          graphs.GraphQueries.B02DepthGolden)}"""
      else "")
    // Sketch-quality sidecar: measured recall of the LSH variants against
    // their exact twins on THIS run's data — a hash-function or banding
    // regression moves these numbers even though the LSH queries are
    // rows-only in the gate. Pairs are few (the corpora are built with
    // sparse near-dup structure), so the set compare is driver-side small.
    val recallExtra = if (only.nonEmpty) "" else try {
      import org.apache.spark.sql.DataFrame
      def pairSet(df: DataFrame): Set[(Long, Long)] =
        df.select(df.columns(0), df.columns(1))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def q(n: String) = SparkEntry.queries(n)(spark, sfDir)
      def rec(got: Set[(Long, Long)], ex: Set[(Long, Long)]): Double =
        if (ex.isEmpty) 1.0 else got.intersect(ex).size.toDouble / ex.size
      val l04r = rec(pairSet(q("l04_minhash_pairs")), pairSet(q("l03_jaccard_pairs")))
      val l07df = q("l07_embed_dup").cache()
      val l08p = pairSet(q("l08_embed_dup_lsh"))
      val l08r = rec(l08p, pairSet(l07df))
      // The 8×6-band mid-sim operating point — nonzero where l08's
      // narrow-band recall is ~0 by design (the corpus's natural pairs
      // sit near cos 0.47).
      val l51r = rec(pairSet(q("l51_embed_dup_lsh_mid")), pairSet(l07df))
      // The SRP sketch's designed regime is genuinely-near-duplicate pairs
      // (P(bit)=1−θ/π: ~97% at cos .99, ~2% at the corpus's .47 pairs), so
      // the vs-all number can sit near 0 BY DESIGN; the hi-sim field
      // reports recall where the S-curve promises hits, when such pairs
      // exist (DedupSpec pins ≥0.9 on a planted fixture either way).
      val hi = pairSet(l07df.filter(col("sim") >= 0.9))
      val hiField = if (hi.nonEmpty) f""","l08_recall_hi_sim":${rec(l08p, hi)}%.4f"""
        else {
          // The corpus generator's near-dup pairs top out near cos≈0.47 at
          // the bench SFs, so the S-curve's DESIGNED regime (≥0.9) would go
          // unmeasured in the committed artifact (it is only fixture-pinned
          // in DedupSpec). Plant it: stage a copy of the embeddings table
          // with two ~cos≈0.999 perturbed duplicates appended and measure
          // LSH recall against the exact scan's ≥0.9 pairs over the STAGED
          // table — same production code paths (Similarity.embedDupPairs*),
          // only the input dir differs. `l08_hi_sim_pairs` records how many
          // ≥0.9 pairs the exact scan certified, so a recall of 1.0 over an
          // accidentally-empty set is visible as such.
          // Staged under the pid-scoped roundtrip root: the shutdown hook
          // and dead-pid sweep reclaim it even after a hard kill between
          // creation and the finally below.
          val staged = sources.FormatRoundtrip.scratch(sfDir, "hisim")
          try {
            val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
            val maxId = e.agg(max("vec_id")).head().getLong(0)
            val planted = e.orderBy("vec_id").limit(2)
              .withColumn("vec_id", col("vec_id") + lit(maxId + 1L))
              .withColumn("embedding", transform(col("embedding"),
                (x, i) => when(i === 0, x + lit(0.05f)).otherwise(x)))
            e.unionByName(planted).repartition(4)
              .write.mode("overwrite").parquet(s"$staged/embeddings.parquet")
            val exactHi = pairSet(llmops.Similarity
              .embedDupPairs(spark, staged).filter(col("sim") >= 0.9))
            val lshHi = pairSet(llmops.Similarity
              .embedDupPairsLsh(spark, staged))
            f""","l08_recall_hi_sim":${rec(lshHi, exactHi)}%.4f""" +
              s""","l08_hi_sim_pairs":${exactHi.size},"l08_hi_sim_planted":true"""
          } finally graft.sources.FormatRoundtrip.recursiveDelete(
            new java.io.File(staged))
        }
      f""","l04_recall_vs_l03":$l04r%.4f,"l08_recall_vs_l07":$l08r%.4f,"l51_recall_vs_l07":$l51r%.4f$hiField"""
    } catch { case e: Throwable =>
      System.err.println(s"BENCH recall sidecar failed: ${e.getMessage}")
      ""
    // finally, not the success path: a sidecar throw after l07df.cache()
    // must not leave the cached pair scan resident for the rest of main.
    } finally spark.catalog.clearCache()
    // Variance-aware round protocol: anchor-throughput ratios vs the
    // PREVIOUS committed artifact (read before this run overwrites it),
    // annotated with the documented host-variance band. The 64M anchors
    // are memory-bandwidth/clock-bound and the per-round VM differs — the
    // same commit has measured b03's loop anywhere in a 2-3× wall band —
    // so cross-round deltas must be read as eips ratios against that
    // band, and the artifact now carries that lens itself instead of
    // requiring a manual tools/compare_bench.py pass.
    val eipsVsPrev = try {
      val p = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
      if (!java.nio.file.Files.exists(p)) "" else {
        val prev = new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        val re = "\"(b[0-9]+_eips_(?:total|loop))\":([0-9.]+)".r
        // FIRST occurrence wins: a prior artifact also carries these keys
        // inside its own eips_vs_prev ratio block, and last-wins would
        // divide by a ratio instead of a throughput.
        def eips(s: String): Map[String, Double] =
          re.findAllMatchIn(s).foldLeft(Map.empty[String, Double]) { (m, x) =>
            if (m.contains(x.group(1))) m
            else m + (x.group(1) -> x.group(2).toDouble)
          }
        val prevMap = eips(prev)
        val ratios = eips(anchorExtra).toSeq.sortBy(_._1).flatMap {
          case (k, v) if v > 0 => prevMap.get(k).filter(_ > 0)
            .map(pv => f""""$k":${v / pv}%.2f""")
          case _ => None
        }
        if (ratios.isEmpty) "" else
          s""","eips_vs_prev":{${ratios.mkString(",")}}""" +
            s""","eips_variance_band":"2-3x across driver VMs (COVERAGE.md anchors note); ratios inside the band are host noise, not regressions""""
      }
    } catch { case e: Throwable =>
      System.err.println(s"BENCH eips-compare sidecar failed: ${e.getMessage}")
      ""
    }
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir","shuffle_read_mb":${benchRead / mb}%.1f,"shuffle_write_mb":${benchWrite / mb}%.1f,"spilled_mb":${benchSpilled / mb}%.1f,"cpus":$cpus$anchorExtra$recallExtra$eipsVsPrev}"""
    println(json)
    // Also persist to a repo file: the driver captures only the last 4 KB
    // of stdout, which has truncated the per-query map (and with it the
    // b-anchor timings) in past rounds. The file is the durable artifact —
    // it additionally carries the per-query shuffle/spill deltas, which the
    // stdout line omits to stay inside the tail capture.
    val perQList = perQ.result()
    val shuffleQs = perQList.filter { case (_, r, w, sp, _) =>
      r >= 0.05 || w >= 0.05 || sp >= 0.05 }
      .map { case (n, r, w, sp, _) =>
        "\"" + n + f"\":[$r%.1f,$w%.1f,$sp%.1f]" }
      .mkString("{", ",", "}")
    // Straggler evidence per query (file artifact only): the longest single
    // task, for every query where it exceeds 1 s. Under skew handling a
    // 64M-edge superstep anchor must NOT show one task spanning most of its
    // wall time — b04's entry here beside b03's is the recorded proof.
    val maxTaskQs = perQList.filter(_._5 >= 1.0)
      .map { case (n, _, _, _, mt) => "\"" + n + f"\":$mt%.1f" }
      .mkString("{", ",", "}")
    // Streaming progress (file artifact only): micro-batches run and peak
    // state-store rows per streaming query — bounded state is the
    // watermark contract, now a recorded number instead of a spec claim.
    val streamQs = {
      import scala.jdk.CollectionConverters._
      graft.streaming.EventQueries.lastDrainStats.asScala.toSeq.sortBy(_._1)
        .map { case (tag, (batches, rows)) =>
          "\"" + tag + s"\":[$batches,$rows]" }
        .mkString("{", ",", "}")
    }
    // Host fingerprint (file artifact only): the 64M-edge anchors are
    // memory-bandwidth/clock-bound, and the per-round VM varies — the same
    // commit measured b03's loop at 19 s and 63 s on two boxes. Recording
    // the host makes cross-round comparisons self-explaining.
    val cpuModel = try {
      val srcFile = scala.io.Source.fromFile("/proc/cpuinfo")
      try srcFile.getLines()
        .collectFirst { case l if l.startsWith("model name") =>
          l.split(":", 2)(1).trim }.getOrElse("unknown")
      finally srcFile.close()
    } catch { case _: Throwable => "unknown" }
    val memGb = Runtime.getRuntime.maxMemory() / (1L << 30)
    val fileJson = json.dropRight(1) +
      s""","host_cpu":"${cpuModel.replace("\"", "")}","heap_gb":$memGb""" +
      s""","query_shuffle_rws_mb":$shuffleQs,"query_max_task_sec":$maxTaskQs,"stream_batches_staterows":$streamQs}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
    java.nio.file.Files.write(out,
      (fileJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
