package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame executor for [[GmrAlgorithm]] — the reference's iteration driver
  * (igmr.cpp:116-247) collapsed to a join→groupBy→join round per superstep:
  *
  *   messages  = activeVertices ⋈ edges           (O4: scan+filter+project)
  *   aggregate = messages.groupBy(dst).agg(...)   (O6+O10: Spark's shuffle
  *               replaces the sort+run-length-group; hash agg needs no sort)
  *   update    = vertices ⟕ aggregate             (O11: merge + convergence)
  *
  * Per-iteration driver cost is ONE action (the changed-count, ≙ the
  * reference's piggybacked Allgather convergence exchange, igmr.cpp:137-149).
  * `localCheckpoint` truncates lineage every round — without it the plan
  * doubles per iteration and optimizer time dominates long before any
  * realistic scale. Vertices carry their static out-degree so PageRank-style
  * messages need no extra join.
  */
object SqlRunner {

  /** Set `-Dgraft.engine.verbose=true` for the reference-log-style
    * per-iteration line (iter, changed count, seconds — ≙ printTimeConsume,
    * gmr.h:317-334).
    */
  private val verbose = sys.props.get("graft.engine.verbose").contains("true")

  /** Superstep count of the most recent run — observability for tests and
    * the O17-style instrumentation (the reference logs per-iteration lines).
    * A convergence regression (e.g. the NaN-ordering hazard in the changed
    * test) shows up here as maxIter instead of ~diameter rounds.
    * Last-writer-wins under concurrent runs (Verify's thread pool): only
    * meaningful where runs are sequential, as in the test suites.
    */
  @volatile var lastIterations: Int = 0

  /** Superstep-loop wall seconds of the most recent run (setup — edge
    * cache, degree, init — excluded), for edges/s throughput reporting
    * against the reference's iteration-phase anchor. Same last-writer-wins
    * caveat as [[lastIterations]].
    */
  @volatile var lastLoopSeconds: Double = 0.0

  /** The local-checkpoint RDD backing a loop-state Dataset, if any. */
  private[graft] def checkpointRdd(df: org.apache.spark.sql.Dataset[_]) =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Run `alg` over `edges(src, dst, weight)`; returns (id, value).
    * `numEdges` < 0 means unknown — one counting pass sizes the loop.
    */
  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
          alg: GmrAlgorithm, meta: GraphMeta, numEdges: Long = -1L): DataFrame = {
    import spark.implicits._

    val sel0 = edges.select($"src", $"dst", $"weight")
    // Unknown size: cache BEFORE counting so the sizing pass and the
    // partitioned cache below share one computation of the edge derivation.
    val needCount = numEdges < 0
    val sel = if (needCount) sel0.cache() else sel0
    val m = if (needCount) sel.count() else numEdges
    LoopConf.withShuffleParts(spark, LoopConf.loopParallelism(spark, m)) {
      // Cached pre-partitioned on src: every superstep's senders⋈edges join
      // finds the edge side already hash-partitioned on its key, so only the
      // (active-set-sized) senders relation shuffles per round — the DataFrame
      // form of the reference's precomputed adjloc routing table
      // (partition.h:276-279).
      val e = sel.repartition($"src").cache()
      val tSetup = System.nanoTime()
      if (verbose) {
        e.count()
        println(f"[${alg.name}] edge cache: ${(System.nanoTime() - tSetup) / 1e9}%.2f s")
      }
      val deg = e.groupBy($"src").agg(count(lit(1)).cast("int").as("outdeg"))
      var verts = vertices.select($"id")
        .join(deg, $"id" === deg("src"), "left")
        .select($"id", coalesce($"outdeg", lit(0)).as("outdeg"),
          alg.initCol($"id", meta).as("value"), lit(true).as("changed"))
        .localCheckpoint()
      if (verbose)
        println(f"[${alg.name}] setup total: ${(System.nanoTime() - tSetup) / 1e9}%.2f s")

      val tLoop = System.nanoTime()
      var iter = 0
      var changedCount = 1L
      while (iter < alg.maxIter && changedCount > 0) {
        iter += 1
        val tIter = System.nanoTime()
        val senders0 = if (alg.activeMessaging) verts.filter($"changed") else verts
        val senders = senders0.filter(alg.sendCondCol($"value"))
        // SHUFFLE_HASH on the small side of both joins. Without the hint
        // the planner sees two co-partitioned inputs (the edge cache and
        // the vertex checkpoint both carry hash partitioning), plans a
        // zero-exchange sort-merge join, and RE-SORTS the full edge
        // relation EVERY superstep — measured 13-35 s/round at 64M edges
        // regardless of active-set size. Hash join keeps the zero-exchange
        // property but probes the big side linearly: build the (active-set
        // sized) senders/aggs map, stream the edges/vertices.
        val aggs = senders.hint("SHUFFLE_HASH").join(e, senders("id") === e("src"))
          .select(e("dst").as("mdst"),
            alg.msgCol(senders("value"), e("weight"), senders("outdeg")).as("msg"))
          .groupBy($"mdst")
          .agg(alg.reduceAgg($"msg").as("agg"))
        val next = verts.join(aggs.hint("SHUFFLE_HASH"), verts("id") === aggs("mdst"), "left")
          .select(verts("id"), verts("outdeg"), verts("value").as("old"),
            alg.updateCol(verts("value"), $"agg", meta).as("value"))
          .select($"id", $"outdeg", $"value",
            // NaN-safe the SQL way: |inf-inf| is NaN, and Spark SQL orders
            // NaN GREATER than every value (unlike Java, where NaN
            // comparisons are false) — without the isnan guard every
            // unreachable vertex counts as changed forever and the loop
            // burns all 120 rounds instead of converging.
            (!isnan($"value" - $"old") &&
              abs($"value" - $"old") > alg.epsilon).as("changed"))
          // Lazy: the changed-count below materializes the checkpoint in the
          // same job, halving the per-superstep job count.
          .localCheckpoint(eager = false)
        val t0 = System.nanoTime()
        changedCount = next.filter($"changed").count()
        if (verbose) {
          println(f"[${alg.name}] iter $iter: changed=$changedCount " +
            f"(count ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
            f"full ${(System.nanoTime() - tIter) / 1e9}%.2f s)")
          if (iter == 1)
            println(next.queryExecution.executedPlan.toString
              .split("== Initial Plan ==").head)
        }
        // The count above materialized `next`'s checkpoint, which truncates
        // its lineage — the previous round's checkpoint is now unreferenced.
        // Free it eagerly: 120 rounds of leaked vertex state is 120×|V| rows
        // of memory pressure, and the resulting GC pauses were measured
        // dominating round time at 4M vertices.
        checkpointRdd(verts).foreach(_.unpersist(blocking = false))
        verts = next
      }
      lastLoopSeconds = (System.nanoTime() - tLoop) / 1e9
      val tUn = System.nanoTime()
      e.unpersist()
      if (needCount) sel.unpersist()
      lastIterations = iter
      if (verbose)
        println(f"[${alg.name}] unpersist: ${(System.nanoTime() - tUn) / 1e9}%.2f s")
      verts.select($"id", $"value")
    }
  }
}
