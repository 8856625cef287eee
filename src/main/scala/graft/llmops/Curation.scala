package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators a training-data pipeline needs between cleaning
  * and training: deterministic splits, stratified downsampling, sequence
  * packing, PII redaction, and mixture-rate planning.
  *
  * Everything here is a pure map/filter or a partitioned window/aggregate —
  * no driver-side state, no global ordering, no RNG. Determinism comes from
  * md5 bucketing (stable across engines, runs, and cluster sizes), which is
  * what makes a 100 TB split reproducible: re-running the pipeline after
  * appending data never reassigns an existing document.
  */
object Curation {

  /** First 8 hex digits of md5(salt || key) mod m — the portable
    * deterministic "RNG". Identical formula in the DuckDB oracles.
    */
  private def hashMod(salt: String, key: Column, m: Int): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % m

  /** 0..99 bucket over md5(salt || key). */
  private def hashBucket(salt: String, key: Column): Column =
    hashMod(salt, key, 100)

  /** L61: quality-weighted ACCEPTANCE SAMPLING — applying a per-document
    * quality score as a sampling PROBABILITY (the DCLM/FineWeb-style
    * "sample by quality" curation step: l16 is the hard filter, l21 the
    * per-language quota, this the soft middle ground). p(doc) = 0.1 +
    * 0.9·min(stop_ratio / 0.45, 1): stopword-rich "natural" text keeps
    * its full weight, degenerate text still gets a 10% floor. A document
    * is accepted iff its content-addressed md5 uniform (0..1e6) falls
    * under p·1e6 — deterministic and append-stable like every sampler
    * here (a document's fate never depends on other rows), and a pure
    * projection: no shuffle, no state, embarrassingly parallel at 100 TB.
    * The acceptance probability is grid-rounded on BOTH engines before
    * the compare (Canon convention), so a u within an ulp of the cut
    * cannot flip membership across engines.
    */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ws = TextOps.tokens($"text")
    val stopArr = array(TextStats.stopwords.map(lit): _*)
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"lang",
        (size(filter(ws, w => array_contains(stopArr, w))).cast("double") /
          greatest(size(ws), lit(1)).cast("double")).as("stop_ratio"),
        hashMod("wsample:", $"doc_id", 1000000).as("u"))
      .select($"doc_id", $"lang", $"u",
        graft.Canon.sig6(lit(0.1) +
          lit(0.9) * least($"stop_ratio" / 0.45, lit(1.0))).as("accept_p"))
      .filter($"u".cast("double") < $"accept_p" * 1000000.0)
      .select($"doc_id", $"lang", $"accept_p")
  }

  /** L20: deterministic train/validation/test assignment (90/5/5).
    * Pure projection: no shuffle, fully pushdown-friendly, and stable under
    * corpus growth — a document's split never changes when other rows are
    * added, unlike `randomSplit` or any count-based scheme.
    */
  def splitAssign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", hashBucket("split:", $"doc_id").as("bucket"))
      .withColumn("split",
        when($"bucket" < 90, "train")
          .when($"bucket" < 95, "validation")
          .otherwise("test"))
  }

  /** L21: stratified downsampling — per-language keep rates applied via a
    * salted hash threshold. A map-side filter (no shuffle, no sampling
    * state); the salt decorrelates it from the split buckets so sampling
    * composes with [[splitAssign]] without bias.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = when($"lang" === "en", 40L)
      .when($"lang" === "es", 60L)
      .when($"lang" === "fr", 80L)
      .otherwise(100L)
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"lang", hashBucket("smp:", $"doc_id").as("bucket"))
      .filter($"bucket" < rate)
  }

  /** L22: sequence packing — concat-then-chunk into fixed token budgets.
    * Documents are streamed per (lang, shard) in doc_id order; each doc's
    * start offset is a running token sum, and its chunk is `offset / budget`
    * (doc-level first-fit: the training-batch packing layout). The shard —
    * a deterministic md5 bucket of doc_id — bounds window-partition size:
    * a bare per-language window would put each language's entire corpus in
    * ONE task (~5 tasks total at any scale); with the shard key the stream
    * fans out `shards`-wide per language, and `shards` scales with the
    * cluster. Packing stays deterministic and append-stable because the
    * shard is content-addressed, not round-robin.
    */
  def packSequences(s: SparkSession, dir: String, budget: Int = 2048,
                    shards: Int = 16): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang", $"shard").orderBy($"doc_id")
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"lang",
        size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("shard", hashMod("pack:", $"doc_id", shards))
      .withColumn("off", sum($"n_tokens").over(w) - $"n_tokens")
      .withColumn("chunk_id", floor($"off" / budget))
      .groupBy($"lang", $"shard", $"chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("chunk_tokens"))
  }

  /** L23: PII redaction — emails then standalone digit runs replaced with
    * typed placeholders; the pre-redaction count is kept for auditing.
    * Patterns are deliberately in the regex subset where Java regex and RE2
    * agree (character classes + greedy quantifiers, no alternation or
    * backtracking-dependent constructs), so the oracle is exact.
    */
  def redactPii(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
    val num = "[0-9]+"
    Tables.load(s, dir, "documents")
      .select($"doc_id",
        regexp_replace(regexp_replace($"text", email, "<EMAIL>"), num, "<NUM>")
          .as("clean_text"),
        regexp_count($"text", lit(num)).as("n_nums"))
  }

  /** L37: context-window chunking — fixed-width character windows with a
    * stride/overlap (width 256, stride 192 → 64-char overlap), the standard
    * long-document → model-context decomposition for embedding and training
    * pipelines. Emits (chunk_idx, start, len, md5) rather than the chunk
    * text itself, so the output relation stays narrow; downstream stages
    * re-slice lazily from the source column. Pure per-row projection —
    * zero shuffle, chunk boundaries depend only on the row, so the
    * operator is embarrassingly parallel and stable under repartitioning.
    */
  def chunkStride(s: SparkSession, dir: String,
                  width: Int = 256, stride: Int = 192): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", posexplode(
        transform(sequence(lit(1), greatest(length($"text"), lit(1)), lit(stride)),
          st => struct(st.as("start"), $"text".substr(st, lit(width)).as("chunk")))))
      .select($"doc_id",
        $"pos".cast("long").as("chunk_idx"),
        $"col.start".cast("long").as("chunk_start"),
        length($"col.chunk").cast("long").as("chunk_len"),
        md5($"col.chunk".cast("binary")).as("chunk_md5"))
  }

  /** L24: mixture-rate planning — the per-source sampling rate that flattens
    * the corpus to a uniform source mix. Input to [[stratifiedSample]]-style
    * filters when rebalancing a crawl. The corpus-wide totals are a one-row
    * aggregate broadcast back over the per-source counts (not an
    * unpartitioned window, which would single-partition the relation).
    */
  def mixRates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.load(s, dir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum($"n").as("total"), count(lit(1)).as("n_sources"))
    counts.crossJoin(broadcast(totals))
      .select($"source", $"n",
        graft.Canon.sig6(
          least(lit(1.0), $"total" / ($"n_sources" * $"n"))).as("rate"))
  }

  /** The registry's sampling temperature — shared with the l49 oracle SQL
    * so the exponent cannot drift between engines if it is ever tuned.
    */
  val TempAlpha = 0.5

  /** L49: temperature-based mixture rates — the multilingual-LM sampling
    * classic: per-source keep probability ∝ n^(α−1) (α = 0.5), normalized
    * so the SMALLEST source keeps 100%. Where [[mixRates]] flattens the
    * mix entirely (α = 0), temperature sampling interpolates between
    * proportional (α = 1) and uniform, preventing tiny sources from being
    * drowned without starving the corpus of its bulk. Same broadcast
    * one-row-normalizer shape as mixRates — the per-source relation never
    * windows or re-shuffles; the expected post-sample count is reported
    * beside the rate for mixture-plan auditing.
    */
  def temperatureMix(s: SparkSession, dir: String, alpha: Double = TempAlpha)
      : DataFrame = {
    import s.implicits._
    val counts = Tables.load(s, dir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val minN = counts.agg(min($"n").as("n_min"))
    counts.crossJoin(broadcast(minN))
      .select($"source", $"n",
        graft.Canon.sig6(
          pow($"n_min".cast("double") / $"n", 1.0 - alpha)).as("rate"),
        graft.Canon.sig6(
          pow($"n_min".cast("double") / $"n", 1.0 - alpha) * $"n")
          .as("expected_docs"))
  }

  /** L47: per-source quota — keep the k longest documents of each source
    * (longest-first, doc_id tie-break), the per-domain cap every crawl
    * pipeline applies before heavy downstream stages.
    *
    * Deliberately NOT `row_number() OVER (PARTITION BY source ...)`: the
    * window form shuffles the ENTIRE corpus to per-source partitions and
    * sorts each source's full document set to keep k rows of it — at 100 TB
    * with a handful of mega-sources that is a corpus-wide sort with a hot
    * partition per big domain. [[graft.functions.TopKAgg]] instead folds
    * (ord, doc_id) pairs into a constant 2k-long buffer that
    * partial-aggregates map-side, so the exchange carries at most
    * tasks x sources x k pairs and no task ever holds more than k rows per
    * source. PlanAuditSpec pins the partial_topk_agg map-side phase;
    * FunctionProperties pins rank-equality with the window form.
    */
  /** The registry's quota — shared with the l47 oracle SQL and
    * CurationSpec so a tuned k cannot desynchronize the engines.
    */
  val QuotaK = 5

  def sourceQuota(s: SparkSession, dir: String, k: Int = QuotaK): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"source", $"n_chars", $"doc_id")
      .groupBy($"source")
      .agg(graft.functions.GraftFunctions
        .topkAgg(s, -$"n_chars", $"doc_id", k).as("top"))
      .select($"source", posexplode($"top"))
      .select($"source", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("doc_id"), (-$"col.ord").as("n_chars"))
  }

  /** L57: the END-TO-END curation funnel — the pipeline a user of this
    * library actually runs between a raw crawl and a training set, as ONE
    * query: exact dedup → fused quality gate → near-dup cluster removal →
    * benchmark decontamination, reported as a per-stage (docs, tokens)
    * funnel. Each stage is the library's own component operator
    * (l02/l40/l25+l44/l26), composed by their keep/drop masks.
    *
    * Composition semantics (the auditable independent-masks form real
    * pipelines use): every signal is computed over the INPUT corpus —
    * quality statistics (LM frequencies, entropy) and dedup clusters are
    * corpus-stable rather than order-dependent on earlier stages — and the
    * stage sets are the cumulative AND of the masks. That keeps each
    * stage's decision independently explainable AND makes the funnel a
    * pure function of the input (re-running after appending data can only
    * append decisions, the hallmark of every operator in this module).
    *
    * Scale shape: every mask relation is (doc_id)-only — the corpus text
    * is touched exactly by the component operators' own pinned shapes
    * (digest-only shingle exchanges, broadcast benchmark set, doc-local
    * quality projections) — and the funnel's semi/anti joins key on
    * doc_id with mask sides AQE-broadcast at gate scale. The output is
    * five summary rows.
    */
  def curationFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", md5($"text").as("h"),
        size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
    // Stage masks, each from the component operator.
    val exKeep = docs.groupBy($"h").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val qKeep = TextStats.fusedQuality(s, dir)
      .filter($"keep").select($"doc_id")
    val ndDrop = graft.graphs.GraphOps.wcc(s,
        Dedup.jaccardPairs(s, dir).select($"doc_a".as("src"), $"doc_b".as("dst")))
      .filter($"id" =!= $"comp").select($"id".as("doc_id"))
    val contam = Dedup.decontaminate(s, dir).select($"doc_id")
    // ONE decorated pass instead of five cascading semi/anti-join
    // aggregates (guide §2.4: share the work, don't re-derive it): each
    // stage mask lands as a boolean flag via a left join (the drop-side
    // relations are distinct()ed so a duplicate marker row can never fan
    // a doc out), stage membership is the cumulative AND, and one
    // aggregate computes every stage's (count, token sum) as conditional
    // sums — the five output rows then project from the one-row relation
    // (the richClub crossJoin idiom). Identical rows to the cascade by
    // construction: semi ≡ flag true, anti ≡ flag null.
    val flagged = docs
      .join(exKeep.withColumn("f1", lit(true)), Seq("doc_id"), "left")
      .join(qKeep.withColumn("f2", lit(true)), Seq("doc_id"), "left")
      .join(ndDrop.distinct().withColumn("f3", lit(true)),
        Seq("doc_id"), "left")
      .join(contam.distinct().withColumn("f4", lit(true)),
        Seq("doc_id"), "left")
      .select($"n_tokens",
        coalesce($"f1", lit(false)).as("s1"),
        (coalesce($"f1", lit(false)) &&
          coalesce($"f2", lit(false))).as("s2"),
        (coalesce($"f1", lit(false)) && coalesce($"f2", lit(false)) &&
          !coalesce($"f3", lit(false))).as("s3"),
        (coalesce($"f1", lit(false)) && coalesce($"f2", lit(false)) &&
          !coalesce($"f3", lit(false)) &&
          !coalesce($"f4", lit(false))).as("s4"))
    val one = flagged.agg(
      count(lit(1)).as("n0"), coalesce(sum($"n_tokens"), lit(0L)).as("t0"),
      sum(when($"s1", 1L).otherwise(0L)).as("n1"),
      coalesce(sum(when($"s1", $"n_tokens")), lit(0L)).as("t1"),
      sum(when($"s2", 1L).otherwise(0L)).as("n2"),
      coalesce(sum(when($"s2", $"n_tokens")), lit(0L)).as("t2"),
      sum(when($"s3", 1L).otherwise(0L)).as("n3"),
      coalesce(sum(when($"s3", $"n_tokens")), lit(0L)).as("t3"),
      sum(when($"s4", 1L).otherwise(0L)).as("n4"),
      coalesce(sum(when($"s4", $"n_tokens")), lit(0L)).as("t4"))
      .localCheckpoint()
    Seq((0, "input"), (1, "exact_dedup"), (2, "quality"),
        (3, "near_dedup"), (4, "decontaminated"))
      .map { case (o, n) =>
        one.select(lit(o.toLong).as("stage_ord"), lit(n).as("stage"),
          col(s"n$o").as("n_docs"), col(s"t$o").as("n_tokens"))
      }
      .reduce(_ unionByName _)
  }
}
