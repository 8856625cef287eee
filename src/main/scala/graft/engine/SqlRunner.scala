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

  /** Per-call run observability, returned by [[runWithStats]] — the
    * race-free alternative to the last-writer-wins volatiles below for
    * callers (anchor queries under Verify's thread pool) that pin a run's
    * own trace. `changedTrace(i)` is superstep i+1's changed-vertex count;
    * the final entry is 0 for an ε-converged run and nonzero when a fixed
    * iteration cap stopped the loop.
    */
  final case class RunStats(iterations: Int, loopSeconds: Double,
                            saltedHubs: Int, saltFactor: Int,
                            changedTrace: Seq[Long])

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

  /** Skew-handling observability for the most recent run: how many
    * high-degree vertices had their edge lists salted across partitions,
    * and the salt fan-out used (1 = uniform path, no salting). Benches
    * persist these beside the throughput so "skew handling engaged" is a
    * recorded fact, not an inference. Same last-writer-wins caveat.
    */
  @volatile var lastSaltedHubs: Int = 0
  @volatile var lastSaltFactor: Int = 1

  /** First-superstep executed plan of the most recent run, captured only
    * under -Dgraft.engine.capturePlan=true — PlanAuditSpec inspects the
    * scatter join structurally (zero-exchange edge side, salted keys)
    * without paying plan retention on production runs.
    */
  @volatile var lastRoundPlan: Option[org.apache.spark.sql.execution.SparkPlan] = None

  /** A vertex qualifies as a salted hub when its out-degree exceeds this
    * multiple of the mean per-partition edge count (i.e. its edge list
    * alone outweighs a whole average partition by 2×).
    */
  private val HubDegreePartitionFactor = 2L

  /** Hub salting only engages once a single edge list is big enough for
    * the straggler to matter; below this the wave structure absorbs it.
    * Tests override via -Dgraft.engine.hubMinDegree to force the path.
    */
  private val HubMinDegreeFloor = 65536L

  /** At most this many distinct hub vertices are salted (the top by
    * degree). A power-law graph concentrates the mass in the first few
    * hubs, so a small cap captures the straggler risk with a bounded
    * `IN (...)` literal set on the hot path.
    */
  private val MaxSaltedHubs = 1024

  /** The hub probe samples this fraction of the edges — a hub past the
    * degree floor contributes ≥ ~650 sampled rows, detection is not
    * borderline. Seeded: the probe is deterministic run-to-run.
    */
  private val HubSampleFraction = 0.01

  /** Below this edge count the probe is skipped outright (unless a test
    * forces the threshold): with sub-8M-edge graphs a whole straggler
    * partition is sub-second work, and tight driver loops (the SCC peel)
    * run this method many times — a probe job per run would cost more than
    * any skew it could find.
    */
  private val HubProbeMinEdges = 8_000_000L

  /** BROADCAST-PULL mode cap (guide §8: broadcast the plan, move heavy
    * rows once — here, never). When the vertex state fits a per-round
    * broadcast (≤ this many vertices, ~16 B each before hash-relation
    * overhead), the edge cache is partitioned by DST and each superstep
    * broadcast-joins the senders INTO it: the scatter join shuffles
    * nothing, and because message rows are then dst-clustered, the
    * partial aggregation collapses them to ≤|V| rows before the exchange
    * — per-round shuffle drops from |frontier out-edges| (64M rows/1 GB
    * on the PageRank anchors) to ≤|V| partials (4M rows). Above the cap
    * (a 100 TB graph's vertex state does not broadcast) the classic
    * src-partitioned shuffle path below runs unchanged — override with
    * -Dgraft.engine.broadcastPullMaxVertices for deployment sizing.
    */
  private def broadcastPullMaxVertices: Long =
    // MEMORY-DERIVED default (r11 verdict item 8, replacing the flat 8M
    // tuned to one box): a broadcast hash relation costs ~48 B/vertex
    // built (16 B row + LongHashedRelation overhead); the ContextCleaner
    // frees the previous round's broadcast lazily (on the GC after the
    // round's checkpoint unlinks it — localCheckpoint's markCheckpointed
    // drops the closure references), so a few retained generations must
    // fit beside the edge cache. heap/(64·48) caps one generation at
    // ~heap/64: a 20 GiB driver derives ~6.5M vertices (the 4M anchors
    // stay in pull mode), an 8 GiB one ~2.6M (the anchors correctly fall
    // back to classic). Broadcast blocks are storage-managed
    // (MEMORY_AND_DISK) so the executor side evicts under pressure; the
    // derivation bounds the driver-side build.
    sys.props.get("graft.engine.broadcastPullMaxVertices").map(_.toLong)
      .getOrElse(math.max(1_000_000L,
        Runtime.getRuntime.maxMemory() / (64L * 48L)))

  /** The local-checkpoint RDD backing a loop-state Dataset, if any. */
  private[graft] def checkpointRdd(df: org.apache.spark.sql.Dataset[_]) =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Run `alg` over `edges(src, dst, weight)`; returns (id, value).
    * `numEdges` < 0 means unknown — one counting pass sizes the loop.
    */
  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
          alg: GmrAlgorithm, meta: GraphMeta, numEdges: Long = -1L): DataFrame =
    runWithStats(spark, vertices, edges, alg, meta, numEdges)._1

  /** [[run]] plus this call's own [[RunStats]]. */
  def runWithStats(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
                   alg: GmrAlgorithm, meta: GraphMeta,
                   numEdges: Long = -1L): (DataFrame, RunStats) = {
    import spark.implicits._

    // NARROW ROWS (guide §2.3) — the loop's two recurring byte streams are
    // the cached edge relation (re-probed every superstep) and the message
    // shuffle; both shrink with the id width and the weight column:
    //  - weight is dropped outright when the algorithm's msg hook never
    //    reads it (alg.usesWeight=false — label propagations, PageRank,
    //    unit-weight anchors): at 64M edges that is 512 MB of constant
    //    doubles per superstep scan.
    //  - src/dst/id narrow from LONG to INT when every vertex id fits —
    //    probed with one vertex-sized agg (the engine contract is that
    //    edges reference declared vertices), gated on the same ≥8M-edge
    //    floor as the hub probe so tight driver loops (the SCC peel) never
    //    pay an extra job on small graphs, where the cache is tiny anyway.
    // Values stay DOUBLE throughout — results are bit-identical; the
    // output re-widens ids to LONG so the surface schema is unchanged.
    val usesWeight = alg.usesWeight
    val sel0 =
      if (usesWeight) edges.select($"src", $"dst", $"weight")
      else edges.select($"src", $"dst")
    // Unknown size: cache BEFORE counting so the sizing pass and the
    // partitioned cache below share one computation of the edge derivation.
    val needCount = numEdges < 0
    val sel = if (needCount) sel0.cache() else sel0
    val m = if (needCount) sel.count() else numEdges
    // Id-width probe, gated on the same ≥8M-edge floor as the hub probe so
    // tight driver loops (the SCC peel) never pay an extra job on small
    // graphs, where the cache is tiny anyway. One vertex-sized agg; the
    // engine contract is that edges reference declared vertices.
    val narrowIds = m >= HubProbeMinEdges && {
      val b = vertices.agg(min($"id"), max($"id")).head()
      !b.isNullAt(0) && b.getLong(0) >= 0L &&
        b.getLong(1) < Int.MaxValue.toLong
    }
    def nid(c: org.apache.spark.sql.Column) =
      if (narrowIds) c.cast("int") else c
    // Mode selection (see [[broadcastPullMaxVertices]]): pull mode
    // partitions the cache by DST and broadcasts the senders per round —
    // zero-shuffle scatter, dst-clustered messages so the partial
    // aggregation collapses them to ≤|V| rows before the exchange.
    val pullMode = meta.numVertices > 0 &&
      meta.numVertices <= broadcastPullMaxVertices
    // PARTITION SIZING BY RELATION (guide §2.2/§2.3: size partitions to
    // the bytes that actually flow, not one count for every relation).
    // The loop moves two very differently sized relations:
    //  - the cached edge relation, scanned once per superstep: 8 B/row
    //    once ids are narrowed and the weight elided (24 B legacy width);
    //  - per-round VERTEX-sized state: the senders scan, the (pull-mode)
    //    message-partial exchange, the update join and the checkpoint —
    //    ~24 B/row over |V| rows.
    // The old single edge-derived count (128 at 64M edges) split each
    // 80 MB vertex pass into 128 ~0.07 s tasks — three waves of mostly
    // scheduling overhead per round. Pull mode therefore sets the session
    // shuffle conf (which sizes exactly the vertex-side exchanges there —
    // the only per-round exchange is the vertex-sized partial-agg one)
    // from the VERTEX bytes, with a defaultParallelism floor once the
    // vertex state is big enough to want the whole box, and partitions
    // the edge cache explicitly from the EDGE bytes. Classic mode's
    // message shuffle is edge-sized, so it keeps the edge-derived conf
    // unchanged.
    val edgeRowBytes = (if (usesWeight) 8 else 0) + (if (narrowIds) 8 else 16)
    val edgeParts = LoopConf.sizedParallelism(spark, m, edgeRowBytes.toLong)
    val vertexParts = {
      val sized = LoopConf.sizedParallelism(
        spark, math.max(1L, meta.numVertices), 24)
      // Floor factor: how many task WAVES per core the vertex stages get
      // once the state is big enough to want the whole box. 1 wave makes
      // a straggling core cost a whole round tail; measured on the 64M
      // anchors (b03/b07 A/B, OPTIMIZATION_r11.md) small multiples win.
      val floorFactor = sys.props.get("graft.engine.vertexPartsFloorFactor")
        .map(_.toInt).getOrElse(4)
      if (meta.numVertices * 24L >= 8L * 1024 * 1024)
        math.max(floorFactor * spark.sparkContext.defaultParallelism, sized)
      else sized
    }
    val parts = if (pullMode) vertexParts else LoopConf.loopParallelism(spark, m)
    // The partition count the edge cache is actually laid out at — the
    // denominator of the hub-straggler threshold below.
    val cacheParts = if (pullMode) edgeParts else parts
    // AQE OFF for the loop's own queries (r12, guide §1.2 config-last):
    // every superstep replans its stages through the adaptive executor —
    // a driver-side latency per stage per round — yet nothing here is
    // adaptive: the join strategy is explicit (broadcast/SHUFFLE_HASH
    // hints), the exchange sizes are pre-computed from |V|/|E| (the
    // sizing above), and the cached edge side is invisible to AQE's
    // skew/coalesce machinery anyway. Measured on the b03 64M anchor
    // (this round, same box): loop 17.2 → 14.4 s and 805 → 625 MB
    // shuffled. Results are execution-identical; override with
    // -Dgraft.engine.loopAdaptive=true to restore.
    val loopConfs = Map("spark.sql.adaptive.enabled" ->
      sys.props.getOrElse("graft.engine.loopAdaptive", "false"))
    LoopConf.withConfs(spark, loopConfs) {
    LoopConf.withShuffleParts(spark, parts) {
      val tSetup = System.nanoTime()
      // SKEW PROBE + HUB SALTING. Hash partitioning sends a vertex's whole
      // edge list to ONE partition, so a power-law hub whose out-degree
      // rivals a full partition serializes its scatter into a straggling,
      // spilling task — and because the edge side is a cached RDD
      // (deliberately: the per-round zero-exchange property), AQE's
      // skew-join splitting cannot engage here (it re-plans shuffle
      // exchanges, and this join reads none on the edge side). The runner
      // therefore handles skew itself: a seeded 1% SAMPLE of the edges
      // estimates out-degrees BEFORE any shuffle, and the top hub vertices
      // (degree > 2× the mean partition's edge count) get their edge lists
      // salted across `saltF` sub-partitions keyed by
      // (src, salt = hash(dst) % saltF), each round's (small) sender set
      // fanning hub rows out to every salt. Probing before the cache build
      // means the salted layout costs the SAME single shuffle as the plain
      // one — measured on the b04 anchor (64M edges, top hub ≈ 2.9M
      // out-edges ≈ 6× a mean partition), salted and unsalted wall times
      // are equal within local[32] run noise. The stable effect is the
      // BOUND: no cached edge shard exceeds ~one mean partition, where
      // unsalted the hub shard grows linearly with the graph — at cluster
      // scale it alone would exceed executor memory. Uniform graphs pay
      // one 1% scan and keep the identical unsalted plan; sub-8M-edge
      // graphs skip even that.
      val meanPartEdges = math.max(1L, m / cacheParts)
      val hubMinDegreeOverride = sys.props.get("graft.engine.hubMinDegree")
        .map(_.toLong)
      val hubMinDegree = hubMinDegreeOverride
        .getOrElse(math.max(HubDegreePartitionFactor * meanPartEdges,
          HubMinDegreeFloor))
      val hubs: Array[(Long, Long)] =
        // Override ≤ 0 disables the probe outright (the pre-probe code
        // path) — the diagnostic A/B knob for attributing anchor-time
        // movement to the probe vs the box.
        if (hubMinDegreeOverride.exists(_ <= 0L) ||
            (m < HubProbeMinEdges && hubMinDegreeOverride.isEmpty))
          Array.empty
        else
          // The straggler risk lives on the cache's PARTITION KEY: src
          // (out-degree hubs) in classic mode, dst (in-degree hubs) in
          // pull mode — either way a vertex whose edge list rivals a
          // partition serializes one task.
          sel.sample(withReplacement = false, HubSampleFraction, seed = 42)
            .groupBy(if (pullMode) $"dst" else $"src")
            .agg(count(lit(1)).as("c"))
            .filter($"c" >= math.max(1L,
              (hubMinDegree * HubSampleFraction).toLong))
            .orderBy($"c".desc).limit(MaxSaltedHubs)
            .collect()
            .map(r => (r.getLong(0), (r.getLong(1) / HubSampleFraction).toLong))
      val salted = hubs.nonEmpty
      val saltF =
        if (!salted) 1
        else {
          // Fan-out sized to the worst hub: enough sub-partitions that its
          // largest shard is about one mean partition, capped at 32.
          val worst = hubs.map(_._2).max
          var f = 2
          while (f < 32 && f.toLong * meanPartEdges < worst) f *= 2
          f
        }
      val hubIds: Seq[Long] = hubs.map(_._1).toIndexedSeq
      // Literal type matches the (possibly narrowed) id columns so the
      // IN-set probe stays a same-type comparison inside codegen.
      val hubLits: Seq[Any] =
        if (narrowIds) hubIds.map(_.toInt) else hubIds
      lastSaltedHubs = hubs.length
      lastSaltFactor = saltF
      val allSalts = array((0 until saltF).map(i => lit(i)): _*)
      // Cached pre-partitioned on src (or (src, salt) under skew): every
      // superstep's senders⋈edges join finds the edge side already
      // hash-partitioned on its key, so only the (active-set-sized)
      // senders relation shuffles per round — the DataFrame form of the
      // reference's precomputed adjloc routing table (partition.h:276-279).
      // Narrowing applies HERE, to the relation every superstep re-reads
      // — the sizing cache above keeps the caller's width.
      val eBase =
        if (usesWeight) sel.select(nid($"src").as("src"),
          nid($"dst").as("dst"), $"weight")
        else sel.select(nid($"src").as("src"), nid($"dst").as("dst"))
      // Pull mode: partitioned by dst (the aggregation key) — the salt,
      // when present, only SPLITS a hot dst's rows across partitions; the
      // scatter join and the groupBy never reference it (the partial
      // aggregate merges the split partials back on the tiny exchange).
      // Classic mode: partitioned by src[, salt] exactly as before.
      val pKey = if (pullMode) $"dst" else $"src"
      val sKey = if (pullMode) $"src" else $"dst"
      val e =
        if (!salted) eBase.repartition(cacheParts, pKey).cache()
        else eBase.withColumn("salt",
            when(pKey.isInCollection(hubLits),
              pmod(xxhash64(sKey), lit(saltF.toLong)).cast("int"))
              .otherwise(lit(0)))
          .repartition(cacheParts, pKey, $"salt").cache()
      if (verbose) {
        e.count()
        println(f"[${alg.name}] edge cache: ${(System.nanoTime() - tSetup) / 1e9}%.2f s")
      }
      // The out-degree aggregate + vertex join only run for algorithms
      // whose message hook reads the degree (PageRank): at 64M edges it is
      // a full-width partial aggregate plus a vertex-sized join for a
      // column SSSP/WCC/max-color never evaluate. When skipped, an
      // explicit count() keeps the edge-cache materialization in SETUP
      // (deg used to force it), so loop seconds stay a loop measurement.
      var verts =
        if (alg.usesOutDegree) {
          val deg = e.groupBy($"src")
            .agg(count(lit(1)).cast("int").as("outdeg"))
          vertices.select(nid($"id").as("id"))
            .join(deg, $"id" === deg("src"), "left")
            .select($"id", coalesce($"outdeg", lit(0)).as("outdeg"),
              alg.initCol($"id", meta).as("value"), lit(true).as("changed"))
            .localCheckpoint()
        } else {
          e.count()
          vertices.select(nid($"id").as("id"))
            .select($"id", lit(0).as("outdeg"),
              alg.initCol($"id", meta).as("value"), lit(true).as("changed"))
            .localCheckpoint()
        }
      if (verbose)
        println(f"[${alg.name}] setup total: ${(System.nanoTime() - tSetup) / 1e9}%.2f s" +
          (if (salted) s" (salted ${hubs.length} hubs ×$saltF)" else ""))

      val tLoop = System.nanoTime()
      val trace = Seq.newBuilder[Long]
      var iter = 0
      var changedCount = 1L
      while (iter < alg.maxIter && changedCount > 0) {
        iter += 1
        val tIter = System.nanoTime()
        val senders0 = if (alg.activeMessaging) verts.filter($"changed") else verts
        val senders1 = senders0.filter(alg.sendCondCol($"value"))
        // Classic salted path: a sender that is a hub fans out to every
        // salt shard of its own edge list; everyone else probes shard 0.
        // The fan-out adds ≤ |hub∩senders|·(saltF−1) rows to the SMALL
        // relation. Pull mode never fans senders out — its salt is pure
        // cache layout.
        val senders2 = if (!salted || pullMode) senders1 else
          senders1.withColumn("salt",
            explode(when($"id".isInCollection(hubLits), allSalts)
              .otherwise(array(lit(0)))))
        // SENDER-SIDE MESSAGE PRECOMPUTE (guide §2.3: shuffle fewer bytes,
        // aggregate before you shuffle — applied to the scatter side). When
        // the message never reads the edge weight (usesWeight=false:
        // PageRank's value/outdeg, label propagations, the unit-weight
        // anchors), msg is a pure function of the SENDER row — so evaluate
        // it ONCE per sender here instead of once per edge in the scatter
        // join's output (|senders| divisions instead of |messages|: 4M vs
        // 64M/round on the PageRank anchors), and ship/broadcast only
        // (id[, salt], msg) — the value/outdeg/changed columns never enter
        // the join. Identical results: the same expression over the same
        // operands, evaluated earlier.
        val senders = if (usesWeight) senders2 else {
          // A sender with no out-edges matches no scatter row, so dropping
          // it is result-identical and shrinks the broadcast — and it is
          // REQUIRED here: the precomputed expression now evaluates on
          // every sender row, and PageRank's value/outdeg would hit
          // DIVIDE_BY_ZERO (ANSI) on dangling vertices that the join used
          // to filter out before the expression ever ran.
          val live =
            if (alg.usesOutDegree) senders2.filter($"outdeg" > 0)
            else senders2
          val msgC = alg.msgCol($"value", lit(1.0), $"outdeg").as("msg")
          if (salted && !pullMode) live.select($"id", $"salt", msgC)
          else live.select($"id", msgC)
        }
        val scatterCond =
          if (!salted || pullMode) senders("id") === e("src")
          else senders("id") === e("src") && senders("salt") === e("salt")
        // Join strategy per mode. Pull: the senders broadcast into the
        // dst-partitioned cache — no exchange at all on the scatter, and
        // the message rows emerge dst-clustered, so the hash aggregate's
        // partial pass collapses them to ≤|V| rows before the (only)
        // per-round exchange. Classic: SHUFFLE_HASH on the small side of
        // both joins — without the hint the planner sees two
        // co-partitioned inputs (the edge cache and the vertex checkpoint
        // both carry hash partitioning), plans a zero-exchange sort-merge
        // join, and RE-SORTS the full edge relation EVERY superstep
        // (measured 13-35 s/round at 64M edges regardless of active-set
        // size); hash join keeps the zero-exchange property but probes
        // the big side linearly.
        val scattered =
          if (pullMode) e.join(broadcast(senders), scatterCond)
          else senders.hint("SHUFFLE_HASH").join(e, scatterCond)
        val aggs = scattered
          .select(e("dst").as("mdst"),
            (if (usesWeight)
              alg.msgCol(senders("value"), e("weight"), senders("outdeg"))
            else senders("msg")).as("msg"))
          .groupBy($"mdst")
          .agg(alg.reduceAgg($"msg").as("agg"))
        val updated = verts.join(aggs.hint("SHUFFLE_HASH"), verts("id") === aggs("mdst"), "left")
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
        val next = updated.localCheckpoint(eager = false)
        val t0 = System.nanoTime()
        changedCount = next.filter($"changed").count()
        trace += changedCount
        // Captured from the PRE-checkpoint frame: the checkpointed Dataset
        // plans as a bare LogicalRDD scan; `updated` carries the real
        // join→agg→join round plan (planning only — nothing re-executes).
        if (iter == 1 && sys.props.get("graft.engine.capturePlan").contains("true"))
          lastRoundPlan = Some(updated.queryExecution.executedPlan)
        if (verbose) {
          println(f"[${alg.name}] iter $iter: changed=$changedCount " +
            f"(count ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
            f"full ${(System.nanoTime() - tIter) / 1e9}%.2f s)")
          // The PRE-checkpoint frame: `next` plans as a bare LogicalRDD
          // scan; `updated` carries the real join→agg→join round plan.
          if (iter == 1)
            println(updated.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        }
        // The count above materialized `next`'s checkpoint, which truncates
        // its lineage — the previous round's checkpoint is now unreferenced.
        // Free it eagerly: 120 rounds of leaked vertex state is 120×|V| rows
        // of memory pressure, and the resulting GC pauses were measured
        // dominating round time at 4M vertices.
        checkpointRdd(verts).foreach(_.unpersist(blocking = false))
        verts = next
      }
      // Local first, volatile second: RunStats must carry THIS call's loop
      // wall — reading the volatile back would let a concurrent run's
      // assignment slip in between (the race RunStats exists to avoid).
      val loopSecs = (System.nanoTime() - tLoop) / 1e9
      lastLoopSeconds = loopSecs
      val tUn = System.nanoTime()
      e.unpersist()
      if (needCount) sel.unpersist()
      lastIterations = iter
      if (verbose)
        println(f"[${alg.name}] unpersist: ${(System.nanoTime() - tUn) / 1e9}%.2f s")
      // Re-widen narrowed ids: the surface schema is (id LONG, value).
      (verts.select(
          (if (narrowIds) $"id".cast("long") else $"id").as("id"), $"value"),
        RunStats(iter, loopSecs, hubs.length, saltF, trace.result()))
    }
    }
  }
}
