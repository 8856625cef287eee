package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** L4 text analysis over `documents`: quality stats, token counting,
  * language distribution, document fingerprinting, language-ID heuristic.
  * All single-pass projections/aggregations — trivially parallel at 100 TB
  * (no shuffle except the final group-bys on low-cardinality keys).
  */
object TextStats {
  import TextOps.tokens

  private[llmops] val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** L4a: per-document quality stats (length, tokens, uniques, stopword
    * ratio, mean token length). Oracle-checked row-wise.
    */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stopArr = array(stopwords.map(lit): _*)
    Tables.load(s, dir, "documents")
      .withColumn("ws", tokens($"text"))
      .select(
        $"doc_id", $"lang",
        length($"text").cast("long").as("chars"),
        size($"ws").cast("long").as("n_tokens"),
        size(array_distinct($"ws")).cast("long").as("n_uniq"),
        (size(filter($"ws", w => array_contains(stopArr, w))).cast("double") /
          greatest(size($"ws"), lit(1)).cast("double")).as("stop_ratio"),
        (aggregate($"ws", lit(0L), (acc, w) => acc + length(w)).cast("double") /
          greatest(size($"ws"), lit(1)).cast("double")).as("mean_tok_len"))
  }

  /** L4b: corpus language distribution. */
  def langDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        graft.Canon.sig6(avg(length($"text"))).as("avg_chars"))
  }

  /** L4c: BPE-ish token counting — runs of letters, runs of digits, single
    * punctuation. Regex kept RE2-compatible so Spark (Java regex) and the
    * DuckDB oracle (RE2) count identically.
    */
  def tokenCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id",
        regexp_count($"text", lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("n_bpeish"),
        regexp_count($"text", lit("[a-z]+")).as("n_words"))
  }

  /** L4d: mod-sampled md5 document fingerprint, exploded to one row per
    * retained char-8-gram digest (winnowing-style selection: keep digests
    * whose last hex nibble is 0 or 1 — a deterministic 1/8 sample).
    * Exploded output keeps the oracle in plain SQL.
    */
  def fingerprints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("grams",
        when(length($"text") >= 8,
          transform(sequence(lit(1), length($"text") - 7),
            i => md5($"text".substr(i, lit(8)))))
          .otherwise(array().cast("array<string>")))
      .select($"doc_id", explode(array_distinct(
        filter($"grams", m => substring(m, 32, 1).isin("0", "1")))).as("fp"))
  }

  /** L4e (l35): winnowing fingerprints (Schleimer et al., the MOSS
    * algorithm) over a polynomial ROLLING hash — the canonical local
    * document fingerprint, complementing l12's mod-sampled md5 variant:
    * winnowing GUARANTEES a fingerprint in every window of `W` consecutive
    * k-grams (mod-sampling can leave arbitrarily long unsampled gaps).
    *
    * Per doc: char-gram hashes h(p) = Σ c(p+j)·B^(K−1−j) mod P for each
    * position (the Rabin-Karp polynomial family — the streaming identity
    * h(p+1) = (h(p) − c(p)·B^{K−1})·B + c(p+K) mod P holds; evaluated
    * positionally here because the HOF form is one codegen loop, same
    * values); then each window of W hashes selects its minimum, ties to
    * the RIGHTMOST position, and the distinct (pos, hash) pairs are the
    * fingerprint set. Everything is integer arithmetic on B=257, P=10⁹+7 —
    * exactly reproducible in the DuckDB oracle (LlmQueries), so unlike
    * most fingerprint schemes this one is hash-gate checked end to end.
    * Pure per-row projection: no shuffle, embarrassingly parallel.
    */
  def winnowFingerprints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // The rolling hash + window-min selection runs as the native
    // `winnow_fps` kernel (graft.functions.Winnow — one JIT'd pass, packed
    // `hash << 32 | pos` longs) instead of the original HOF pipeline,
    // whose interpreted per-character lambdas measured 8.4 s over the
    // sf0.1 corpus; DedupSpec pins the kernel against an independent
    // driver-side winnowing recompute, and the integer-SQL oracle
    // (LlmQueries) is unchanged.
    Tables.load(s, dir, "documents")
      .select($"doc_id",
        explode(graft.functions.GraftFunctions.winnowFps(s, $"text", 8, 4)).as("pk"))
      .select($"doc_id",
        $"pk".bitwiseAND(lit(0xFFFFFFFFL)).as("pos"),
        shiftrightunsigned($"pk", 32).as("fp"))
  }

  /** L4f: rule-based quality filter — the keep/drop decision stage of a
    * training-data pipeline, with the FIRST failing rule as the recorded
    * reason (auditable filtering, not just a boolean). Pure projection:
    * embarrassingly parallel at corpus scale.
    */
  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    qualityFilterOn(s, docsWithTokens(s, dir))

  /** The shared (doc_id, text, ws=tokens(text)) base relation — the
    * tokenize-once parameter (r12): [[fusedQuality]] caches ONE of these
    * and feeds all four signal passes from it, so the corpus is scanned
    * and tokenized once instead of four times; each standalone query
    * builds its own (uncached) copy, which projection-collapses to the
    * exact plan it had before the refactor.
    */
  private[llmops] def docsWithTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"text", tokens($"text").as("ws"))
  }

  private[llmops] def qualityFilterOn(s: SparkSession, base: DataFrame): DataFrame = {
    import s.implicits._
    val stopArr = array(stopwords.map(lit): _*)
    base
      .select($"doc_id",
        length($"text").cast("long").as("chars"),
        size($"ws").cast("long").as("n_tokens"),
        (size(filter($"ws", w => array_contains(stopArr, w))).cast("double") /
          greatest(size($"ws"), lit(1)).cast("double")).as("stop_ratio"))
      .select($"doc_id", $"chars", $"n_tokens",
        when($"chars" < 150, "too_short")
          .when($"n_tokens" < 20, "few_tokens")
          .when($"stop_ratio" > 0.45, "stopword_heavy")
          .otherwise("ok").as("reason"))
      .withColumn("keep", ($"reason" === "ok").cast("boolean"))
  }

  /** L4g: corpus-level top-k n-grams (k=20 bigrams) — vocabulary/frequency
    * analysis. Map-side partial aggregation collapses the per-partition
    * counts before the single low-cardinality shuffle; the global top-k is
    * a TakeOrdered, not a full sort.
    */
  def topNgrams(s: SparkSession, dir: String, n: Int = 2, k: Int = 20): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(tokens($"text").as("ws")) // materialized first; see docShingles
      .select(explode(TextOps.shingles($"ws", n)).as("ngram"))
      .groupBy($"ngram").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"ngram".asc)
      .limit(k)
  }

  /** L4e: n-gram/stopword language-ID heuristic. The synthetic corpus shares
    * one vocabulary across langs, so this demonstrates the mechanics (scored
    * evidence columns + argmax), not real accuracy. Rows-only check.
    */
  def langIdHeuristic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val markers: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "and", "of"),
      "es" -> Seq("el", "la", "de"),
      "fr" -> Seq("le", "la", "et"),
      "de" -> Seq("der", "die", "und"),
      "zh" -> Seq.empty)
    val scored = Tables.load(s, dir, "documents")
      .withColumn("ws", tokens($"text"))
    val scoreCols = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val score = if (ms.isEmpty) lit(0)
      else size(filter($"ws", w => ms.map(m => w === m).reduce(_ || _)))
      struct(score.cast("double").as("score"), lit(lang).as("lang"))
    }
    scored.select($"doc_id", $"lang",
      sort_array(array(scoreCols: _*), asc = false)(0).getField("lang").as("lang_pred"))
  }

  /** L4i: repetition scoring (the Gopher/MassiveText rule family): the
    * fraction of the document taken by its single most frequent token, and
    * the fraction of duplicate bigrams. High values flag boilerplate and
    * generation loops — a quality signal orthogonal to length/stopword
    * rules (l16) and statistical LM score (l27). The bigram stats are
    * row-local array ops; only the unigram argmax aggregates.
    */
  def repetitionStats(s: SparkSession, dir: String): DataFrame =
    repetitionStatsOn(s, docsWithTokens(s, dir))

  private[llmops] def repetitionStatsOn(s: SparkSession, base: DataFrame): DataFrame = {
    import s.implicits._
    val tc = base
      .select($"doc_id", explode($"ws").as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    val top = tc.groupBy($"doc_id")
      .agg((max($"c").cast("double") / sum($"c")).as("top_tok_frac"))
    val bg = base
      .select($"doc_id", TextOps.shingles($"ws", 2).as("bg"))
      .select($"doc_id",
        (lit(1.0) - size(array_distinct($"bg")).cast("double") /
          greatest(size($"bg"), lit(1)).cast("double")).as("dup_bigram_frac"))
    top.join(bg, "doc_id")
  }

  /** L4h: per-document top term with its TF-IDF score. Selection order is
    * deliberately integer-only — (tf DESC, df ASC, term ASC): most frequent
    * term, rarest on ties, then alphabetic — so no engine's libm rounding
    * can flip the argmax; the float tf·idf score is only REPORTED (rounded),
    * never ordered on. One tokenized relation feeds both tf and df; the df
    * join shuffles on the term (AQE broadcasts small vocabularies).
    */
  def tfidfTop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.load(s, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .cache()
    val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val nDocs = Tables.load(s, dir, "documents")
      .agg(count(lit(1)).cast("double").as("nd"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"tok".asc)
    tf.join(df, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"tok".as("top_term"), $"tf", $"df",
        graft.Canon.sig6($"tf" * log($"nd" / $"df")).as("tfidf"))
  }

  /** L4f: statistical LM quality scoring — per-document mean unigram
    * log-probability under the corpus's own unigram model (the CCNet-style
    * perplexity filter, with the corpus standing in for the reference LM).
    * Gibberish/rare-token documents score low; stopword soup scores high —
    * the complement of the rule-based [[qualityFilter]].
    *
    * One tokenized relation (cached) feeds both the frequency model and the
    * scoring join; the vocabulary join shuffles on the token (AQE broadcasts
    * it when the vocab is small); the grand total rides in as a broadcast
    * one-row frame.
    */
  def unigramLogProb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    unigramLogProbOn(s, Tables.load(s, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .cache())
  }

  /** `toks` is the exploded (doc_id, tok) relation; the standalone path
    * caches its own copy (it is read twice: model + scoring join), the
    * fused path derives it from the shared cached token-array base.
    */
  private[llmops] def unigramLogProbOn(s: SparkSession, toks: DataFrame): DataFrame = {
    import s.implicits._
    val freq = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum($"cnt").cast("double").as("n"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        graft.Canon.sig6(avg(log10($"cnt" / $"n"))).as("logprob"))
  }

  /** L60: CCNet-style PERPLEXITY BUCKETING (Wenzek et al. 2020) — the
    * head/middle/tail split every CommonCrawl curation pipeline applies:
    * per language, rank documents by the LM quality score (l27's unigram
    * log-prob, higher = more fluent) and cut into `nBuckets` equal-count
    * buckets (0 = head … nBuckets−1 = tail), reporting each bucket's
    * volume and mean score — the table a data-mixture designer reads
    * before deciding how much tail to keep.
    *
    * Determinism: ranks order the grid-rounded score with doc_id
    * tie-break (a total order), and the bucket is pure integer arithmetic
    * ((rank−1)·nBuckets div n) — no float boundary can flip membership.
    * Scale: the windows are LANGUAGE-partitioned (CCNet itself ranks per
    * language shard), never corpus-global, and the output is
    * (lang × bucket)-sized.
    */
  def pplBuckets(s: SparkSession, dir: String, nBuckets: Int = 3): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val scored = unigramLogProb(s, dir)
    val docs = Tables.load(s, dir, "documents").select($"doc_id", $"lang")
    val w = Window.partitionBy($"lang").orderBy($"logprob".desc, $"doc_id")
    val cw = Window.partitionBy($"lang")
    scored.join(docs, "doc_id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(cw))
      .withColumn("bucket",
        expr(s"CAST(((rank - 1) * $nBuckets) DIV n AS BIGINT)"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        graft.Canon.sig6(avg($"logprob")).as("avg_logprob"),
        sum($"n_tokens").as("total_tokens"))
  }

  /** L43: per-document mean bigram conditional log-probability under the
    * corpus's own bigram model — the next rung up the CCNet-style quality
    * ladder from l27's unigram score (a doc of real phrases scores high even
    * when its individual words are rare; shuffled-word junk scores low even
    * when every word is common). P(w2|w1) = c(w1 w2) / c(w1 ·), both counts
    * from the corpus itself, no smoothing needed: every bigram being scored
    * exists in the model by construction.
    *
    * Scale shape: documents collapse to DOC-LEVEL DISTINCT bigram rows
    * (doc_id, w1, w2, k) in one map-side-combined aggregation — the only
    * corpus-scale pass. The model relations derive from that relation (bcnt
    * by re-aggregation, the prefix count pcnt from bcnt — vocabulary-sized,
    * not corpus-sized), and the scoring join runs on doc-level rows with
    * integer weights, so the weighted mean Σ k·log10(bcnt/pcnt) / Σ k
    * touches each distinct per-doc bigram once regardless of repetition.
    */
  def bigramLogProb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bi = Tables.load(s, dir, "documents")
      .select($"doc_id", tokens($"text").as("ts"))
      .filter(size($"ts") >= 2)
      .select($"doc_id", explode(transform(sequence(lit(1), size($"ts") - 1),
        i => struct(element_at($"ts", i).as("w1"),
          element_at($"ts", i + 1).as("w2")))).as("b"))
      .groupBy($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
      .agg(count(lit(1)).as("k"))
      .cache()
    val bc = bi.groupBy($"w1", $"w2").agg(sum($"k").as("bcnt"))
    val pc = bc.groupBy($"w1").agg(sum($"bcnt").as("pcnt"))
    val out = bi.join(bc, Seq("w1", "w2")).join(pc, Seq("w1"))
      .groupBy($"doc_id")
      .agg(sum($"k").as("n_bigrams"),
        graft.Canon.sig6(sum($"k" * log10($"bcnt" / $"pcnt")) / sum($"k"))
          .as("logprob"))
    out
  }

  /** L46: vocabulary coverage / OOV rate — fix the vocabulary to the
    * corpus's top-`v` tokens (total order: count desc, token asc) and
    * report per-language token counts, out-of-vocabulary counts, and the
    * OOV rate. The standard tokenizer-design check: a vocab sized for the
    * majority language starves the tail languages, and this is the query
    * that shows it before training does.
    *
    * Scale shape: one corpus-scale (lang, tok) aggregation feeds both the
    * global frequency cut and the per-language rollup; the top-`v` vocab
    * is a TakeOrdered cut broadcast back, so the corpus never shuffles on
    * token identity twice.
    */
  def vocabCoverage(s: SparkSession, dir: String, v: Int = 1000): DataFrame = {
    import s.implicits._
    val tk = Tables.load(s, dir, "documents")
      .select($"lang", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("k"))
      .cache()
    val top = tk.groupBy($"tok").agg(sum($"k").as("cnt"))
      .orderBy($"cnt".desc, $"tok".asc).limit(v)
      .select($"tok", lit(1).as("in_v"))
    tk.join(broadcast(top), Seq("tok"), "left")
      .groupBy($"lang")
      .agg(sum($"k").as("n_tokens"),
        sum(when($"in_v".isNull, $"k").otherwise(0L)).as("n_oov"),
        graft.Canon.sig6(
          sum(when($"in_v".isNull, $"k").otherwise(0L)).cast("double") /
            sum($"k")).as("oov_rate"))
  }

  /** L4j (l36): one distributed BPE merge-counting round — the adjacent
    * symbol-pair frequencies that drive byte-pair-encoding vocabulary
    * induction, reported as the top-k pairs. Like production BPE trainers,
    * the counting runs over the WORD VOCABULARY (word, count) rather than
    * the raw corpus: the corpus collapses to its vocabulary in one
    * map-side-combined aggregation, and the per-word char-pair expansion —
    * the expensive quadratic-ish bit — then touches each distinct word
    * once, weighted by its count. At 100 TB the vocabulary is millions of
    * rows where the corpus is trillions, so the pair stage is effectively
    * free. Tie-break (count desc, pair asc) is a total order, so the top-k
    * cut is deterministic; integer counts make it exact across engines.
    */
  def bpePairCounts(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import s.implicits._
    val vocab = Tables.load(s, dir, "documents")
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
    vocab.filter(length($"w") >= 2)
      .select(explode(transform(sequence(lit(1), length($"w") - 1),
        i => $"w".substr(i, lit(2)))).as("pair"), $"cnt")
      .groupBy($"pair").agg(sum($"cnt").as("pair_count"))
      .orderBy($"pair_count".desc, $"pair".asc)
      .limit(k)
  }

  /** L42: BPE tokenizer TRAINING — `rounds` actual merge rounds, not just
    * l36's single pair count. Each round: count adjacent symbol pairs over
    * the vocabulary (count-weighted), pick the most frequent pair
    * (deterministic ties: count desc, then pair lexicographic), merge it
    * into one symbol everywhere, repeat. Returns the merge table — the
    * artifact a BPE tokenizer ships.
    *
    * Scale shape (the classic BPE-trainer layout): the corpus collapses to
    * its word vocabulary FIRST — one map-side-combined aggregation is the
    * only corpus-scale pass — and every merge round then runs on the
    * vocab relation (orders of magnitude smaller), as one pair aggregation
    * plus a broadcast 1-row join. Words are spelled as space-delimited
    * symbol strings and a merge applies as a leftmost-greedy
    * string-accumulator fold (see [[bpeMergeRounds]]) — exact BPE apply
    * semantics, identical in Spark (`aggregate` HOF) and DuckDB
    * (`list_reduce`), and differentially tested against an independent
    * driver-side implementation on random corpora.
    */
  def bpeTrain(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val (merges, fin) = bpeMergeRounds(s, dir, rounds)
    // Every round's 1-row merge record is eagerly checkpointed inside the
    // loop, so the working vocab cache can be freed before the union.
    fin.unpersist()
    if (merges.isEmpty) {
      // Vocabulary exhausted before round 1 (every token a single symbol):
      // no merges to report. The loop guards this mid-run; an unguarded
      // reduce here would throw on the empty Seq while the oracle returns
      // an empty relation for the same corpus.
      import org.apache.spark.sql.types._
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("round", IntegerType, nullable = false),
          StructField("sym_a", StringType), StructField("sym_b", StringType),
          StructField("merged", StringType),
          StructField("pair_count", LongType))))
    } else merges.reduce(_ union _)
  }

  /** L45: BPE tokenizer ENCODE — applies the merge table [[bpeTrain]]
    * learns back to the corpus and reports per-document character and
    * BPE-token counts (the chars-per-token compression ratio is THE
    * curation signal a trained tokenizer yields: natural text compresses,
    * junk doesn't). Train and encode share one merge-round loop, so the
    * applied vocabulary is the trained one by construction.
    *
    * Scale shape: the merge rounds run on the vocab relation (see
    * [[bpeMergeRounds]]); encoding then needs NO corpus-scale string work
    * at all — each document's token multiset (one map-side-combined agg)
    * joins the per-token symbol-count relation and sums integer weights.
    */
  /** L69: one-row CORPUS CARD — the dataset-card summary a curation run
    * publishes beside its output: document/token volume, language and
    * source breadth, the exact-duplicate fraction (1 − distinct digests /
    * docs, l01's signal as a rate), and mean tokens per document. ONE
    * aggregation pass (count-distincts shuffle digest/lang/source keys,
    * nothing wider); integers exact, the two rates on the sig6 grid.
    */
  def corpusCard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"lang", $"source", md5($"text").as("digest"),
        size(tokens($"text")).as("nt"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"nt").as("n_tokens"),
        countDistinct($"lang").as("n_langs"),
        countDistinct($"source").as("n_sources"),
        countDistinct($"digest").as("n_unique_docs"))
      .select($"n_docs", $"n_tokens", $"n_langs", $"n_sources",
        $"n_unique_docs",
        graft.Canon.sig6(lit(1.0) -
          $"n_unique_docs".cast("double") / $"n_docs".cast("double"))
          .as("exact_dup_frac"),
        graft.Canon.sig6($"n_tokens".cast("double") /
          $"n_docs".cast("double")).as("mean_tokens"))
  }

  /** The trained vocabulary's per-token symbol counts `(tok, n_sym)` —
    * the shared preamble of [[bpeEncode]] (l45) and [[bpeFertility]]
    * (l67), so the two replays of the l42 merge table cannot drift.
    * Vocab-sized; pinned eagerly so the big cached vocab can be freed.
    */
  private def trainedSymCounts(s: SparkSession, dir: String,
                               rounds: Int): DataFrame = {
    import s.implicits._
    val (_, fin) = bpeMergeRounds(s, dir, rounds)
    val symc = fin.select($"tok",
        size(split(trim($"w"), " ")).as("n_sym"))
      .localCheckpoint()
    fin.unpersist()
    symc
  }

  def bpeEncode(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    import s.implicits._
    val symc = trainedSymCounts(s, dir, rounds)
    val dt = Tables.load(s, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("k"))
    dt.join(symc, "tok")
      .groupBy($"doc_id")
      .agg(sum($"k" * length($"tok")).as("n_chars"),
        sum($"k" * $"n_sym").as("n_bpe_tokens"))
  }

  /** L67: tokenizer FERTILITY by language — BPE tokens per word and chars
    * per BPE token under the corpus-trained [[bpeTrain]] vocabulary, split
    * by the `lang` column. Fertility is THE cross-lingual tokenizer-equity
    * diagnostic (a language whose words fragment into many tokens pays
    * more compute per content unit and starves in a token-budgeted mix);
    * chars-per-token is the compression twin l45 reports per document.
    *
    * Scale shape: identical to [[bpeEncode]] — the merge rounds run on the
    * vocab relation, then one (lang, tok) map-side-combined aggregate
    * joins the vocab-sized symbol-count relation; no corpus-scale string
    * work, output is one row per language.
    */
  def bpeFertility(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    import s.implicits._
    val symc = trainedSymCounts(s, dir, rounds)
    val lt = Tables.load(s, dir, "documents")
      .select($"lang", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("k"))
    lt.join(symc, "tok")
      .groupBy($"lang")
      .agg(sum($"k").as("n_words"),
        sum($"k" * $"n_sym").as("n_bpe_tokens"),
        sum($"k" * length($"tok")).as("n_chars"))
      .select($"lang", $"n_words", $"n_bpe_tokens",
        graft.Canon.sig6($"n_bpe_tokens".cast("double") /
          $"n_words".cast("double")).as("fertility"),
        graft.Canon.sig6($"n_chars".cast("double") /
          $"n_bpe_tokens".cast("double")).as("chars_per_token"))
  }

  /** The shared BPE merge-round loop: collapse the corpus to its word
    * vocabulary (tok, spelled `w`, cnt) — the only corpus-scale pass —
    * then per round count pairs, pick the top merge, and apply it to the
    * whole vocab via the leftmost-greedy fold (see the in-loop comment).
    * Returns (per-round 1-row merge tables, final CACHED vocab) — the
    * caller owns unpersisting the vocab.
    */
  private def bpeMergeRounds(s: SparkSession, dir: String, rounds: Int)
      : (Seq[DataFrame], DataFrame) = {
    import s.implicits._
    var vocab = Tables.load(s, dir, "documents")
      .select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .select($"tok", concat(lit(" "),
        concat_ws(" ", filter(split($"tok", ""), c => c =!= "")),
        lit(" ")).as("w"), $"cnt")
      .cache()
    val out = Seq.newBuilder[DataFrame]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val syms = split(trim($"w"), " ")
      val top = vocab.select(syms.as("ss"), $"cnt")
        .filter(size($"ss") >= 2)
        .select(explode(transform(sequence(lit(1), size($"ss") - 1),
          i => struct(element_at($"ss", i).as("a"),
            element_at($"ss", i + 1).as("b")))).as("p"), $"cnt")
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"cnt").as("pair_count"))
        .orderBy($"pair_count".desc, $"a".asc, $"b".asc)
        .limit(1)
        .select(lit(r).as("round"), $"a".as("sym_a"), $"b".as("sym_b"),
          concat($"a", $"b").as("merged"), $"pair_count")
        // Eager 1-row pin: later rounds unpersist this round's vocab, and
        // an unpinned plan would re-derive the whole merge chain from the
        // corpus when the final union materializes.
        .localCheckpoint()
      // Exhausted vocabulary (every word already one symbol): no merge to
      // learn or apply — a cross join against the empty top would silently
      // WIPE the vocab. The oracles guard the same case with a LEFT JOIN.
      if (top.isEmpty) exhausted = true
      else {
        out += top
        // Leftmost-greedy merge apply as a string-accumulator fold: push
        // each symbol; when the accumulator's LAST symbol is sym_a and the
        // incoming one is sym_b, pop and push the merged symbol instead.
        // This is exactly BPE's left-to-right non-overlapping scan (a
        // freshly merged symbol can never equal sym_a again, so it cannot
        // over-merge) — including odd same-symbol runs, where a literal
        // " a b "→" ab " replace pairs the wrong occurrences ("b b b b b"
        // must become "bb bb b", not "bb b bb"; caught by the
        // differential spec). The oracle runs the identical fold via
        // DuckDB list_reduce.
        val prev = vocab
        val foldApply = {
          val syms = split(trim($"w"), " ")
          val folded = aggregate(syms, lit(""),
            (acc, x) => when(x === $"sym_b" &&
                endswith(acc, concat(lit(" "), $"sym_a")),
              concat(acc.substr(lit(1),
                length(acc) - length($"sym_a") - 1),
                lit(" "), $"merged"))
              .otherwise(concat(acc, lit(" "), x)))
          concat(folded, lit(" "))
        }
        vocab = vocab.crossJoin(broadcast(top))
          .select($"tok", foldApply.as("w"), $"cnt")
          .cache()
        vocab.count() // materialize before freeing the parent
        prev.unpersist()
        r += 1
      }
    }
    (out.result(), vocab)
  }

  /** L4k (l38): per-document Shannon character entropy (nats) — the
    * information-density quality signal: near-zero for repeated-character
    * junk, high for natural text. Complements the rule-based (l16),
    * statistical-LM (l27), and repetition (l30) filters.
    *
    * Entirely row-local array arithmetic — zero shuffle, embarrassingly
    * parallel at any scale. The char array is bound as a one-element-array
    * lambda variable (the l35 winnowing pitfall: a named column would be
    * re-inlined by CollapseProject into every one of the ~n_distinct
    * filter() references and the split would re-run per distinct char).
    * The keep flag is computed from the ROUNDED entropy on both engines,
    * so grid-boundary documents cannot flip across the gate.
    */
  def charEntropy(s: SparkSession, dir: String, threshold: Double = 2.8): DataFrame =
    charEntropyOn(s, Tables.load(s, dir, "documents"), threshold)

  private[llmops] def charEntropyOn(s: SparkSession, docs: DataFrame,
                                    threshold: Double = 2.8): DataFrame = {
    import s.implicits._
    val ent = element_at(
      transform(array(filter(split($"text", ""), c => c =!= "")), cs => {
        val n = size(cs).cast("double")
        aggregate(array_distinct(cs), lit(0.0), (acc, d) => {
          val p = size(filter(cs, c => c === d)).cast("double") / n
          acc - p * log(p)
        })
      }), 1)
    docs
      .select($"doc_id", graft.Canon.sig6(ent).as("char_entropy"))
      .withColumn("keep", ($"char_entropy" >= threshold).cast("boolean"))
  }

  /** L4g: BM25 top-k retrieval (Lucene idf variant: ln((N-df+0.5)/(df+0.5)+1),
    * tf saturation k1=1.2, length normalization b=0.75) for a fixed term set
    * over the document corpus — the lexical half of a retrieval/RAG pipeline
    * next to the embedding top-k (l06/l15).
    *
    * Determinism across engines: every input to the score is integral
    * (tf, df, dl) or an exact integer ratio (avgdl), so the only cross-engine
    * noise is libm ln() ulps and the 3-term sum order; rounding to the shared
    * 9-sig grid BEFORE the top-k cut means both engines rank identical
    * doubles, with doc_id as the total-order tie-break — the float-ranking
    * analogue of l29's integer-only argmax.
    *
    * Scale: one tokenized pass (shared cache), term filter BEFORE the tf
    * aggregation so only query-term postings shuffle, per-doc stats ride in
    * as a broadcast one-row frame, and the final cut is orderBy+limit —
    * TakeOrdered's per-partition top-k, never a global sort.
    */
  def bm25TopK(s: SparkSession, dir: String,
               queryTerms: Seq[String] = Seq("spark", "join", "window"),
               k1: Double = 1.2, b: Double = 0.75, k: Int = 20): DataFrame = {
    import s.implicits._
    bm25Scores(s, dir, queryTerms, k1, b)
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  /** The full (doc_id, score) BM25 relation behind [[bm25TopK]] — also the
    * lexical leg of the hybrid fusion (Similarity.hybridRrf). Scores carry
    * the shared 9-sig rounding so every downstream rank/cut is
    * deterministic across engines.
    */
  def bm25Scores(s: SparkSession, dir: String, queryTerms: Seq[String],
                 k1: Double, b: Double): DataFrame = {
    import s.implicits._
    val toks = Tables.load(s, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .cache()
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("nd"),
      avg($"dl").as("avgdl"))
    val tf = toks.filter($"tok".isin(queryTerms: _*))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    tf.join(df, "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(($"nd" - $"df" + 0.5) / ($"df" + 0.5) + 1.0) *
          ($"tf" * (k1 + 1.0)) /
          ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"dl" / $"avgdl")))
      .groupBy($"doc_id")
      .agg(graft.Canon.sig6(sum($"contrib")).as("score"))
  }

  /** L59: HARD-NEGATIVE MINING for retrieval training — the standard
    * dense-retriever data recipe (DPR/Karpukhin et al. 2020: "BM25 hard
    * negatives"): for the query, take the BM25 ranking, call the top-1 the
    * positive, EXCLUDE the positive and its near-duplicates (an n-gram
    * Jaccard pair is a false negative waiting to poison the contrastive
    * loss — the well-known caveat), and emit the next k highest-scoring
    * docs as the training negatives. Pure composition of first-class
    * operators: l32's BM25 relation + l03's Jaccard pairs + an anti-join.
    *
    * Scale posture: the scored relation is bounded by the query-term
    * postings (term filter before any aggregation, per bm25Scores); the
    * positive + its dup set is tiny and broadcast into the anti-join; the
    * final cut is orderBy+limit (TakeOrdered) with the rank assigned
    * within the k-row result, never a corpus-wide window. Determinism:
    * scores are grid-rounded before every rank/cut, ties break on doc_id.
    */
  def hardNegatives(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val scores = bm25Scores(s, dir, Seq("spark", "join", "window"), 1.2, 0.75)
    val top1 = scores.orderBy($"score".desc, $"doc_id").limit(1)
      .select($"doc_id".as("pos_id"))
    val pairs = Dedup.jaccardPairs(s, dir).select($"doc_a", $"doc_b")
    val dups = pairs.join(broadcast(top1), $"doc_a" === $"pos_id")
        .select($"doc_b".as("doc_id"))
      .unionByName(pairs.join(broadcast(top1), $"doc_b" === $"pos_id")
        .select($"doc_a".as("doc_id")))
      .unionByName(top1.select($"pos_id".as("doc_id")))
    scores.join(broadcast(dups), Seq("doc_id"), "left_anti")
      .orderBy($"score".desc, $"doc_id").limit(k)
      .select(row_number().over(Window.orderBy($"score".desc, $"doc_id"))
        .cast("long").as("neg_rank"), $"doc_id", $"score")
  }

  /** L40: the fused multi-signal quality verdict — hard rules first
    * (length/token/stopword), then the statistical signals in a fixed
    * precedence (repetition, LM score, entropy). One row per document
    * with every signal and the final keep flag; l57's funnel consumes the
    * keep mask, the registry exposes the full row.
    */
  def fusedQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // TOKENIZE ONCE (r12, guide §2.4 "share the work"): the four signal
    // passes previously each re-scanned and re-tokenized the corpus (and
    // unigramLogProb cached its own exploded copy). One cached
    // (doc_id, text, ws) base now feeds all four via the *On variants —
    // the signal expressions are the standalone functions' own, evaluated
    // over the same tokens, so every value (and the standalone queries
    // l16/l30/l27/l38) is unchanged. At 100 TB this is the difference
    // between one corpus read and four.
    val base = docsWithTokens(s, dir).cache()
    val rules = qualityFilterOn(s, base)
      .select($"doc_id", $"reason".as("rule_reason"))
    val rep = repetitionStatsOn(s, base)
      .select($"doc_id", $"top_tok_frac")
    val lm = unigramLogProbOn(s, base.select($"doc_id", explode($"ws").as("tok")))
      .select($"doc_id", $"logprob")
    val ent = charEntropyOn(s, base)
      .select($"doc_id", $"char_entropy")
    // LEFT joins from the rules relation (a total projection): a
    // zero-token document has no repetition/LM row at all, but it must
    // still receive its (rules-family) verdict — the rules check runs
    // first in the CASE, so the null signals can never be compared.
    rules.join(rep, Seq("doc_id"), "left")
      .join(lm, Seq("doc_id"), "left")
      .join(ent, Seq("doc_id"), "left")
      .withColumn("reason",
        when($"rule_reason" =!= "ok", concat(lit("rules:"), $"rule_reason"))
          .when($"top_tok_frac" > 0.15, lit("repetition"))
          .when($"logprob" < -1.5, lit("lm_score"))
          .when($"char_entropy" < 2.8, lit("entropy"))
          .otherwise(lit("ok")))
      .withColumn("keep", ($"reason" === "ok").cast("boolean"))
  }

  /** L54: DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling") — per-document hashed
    * unigram importance: weight = mean over the doc's tokens of
    * log10(p_target(b)/p_raw(b)), where b is the token digest folded into
    * `buckets` feature buckets and both distributions are Laplace-smoothed
    * bucket unigram models (target = the English slice standing in for the
    * downstream-domain sample; raw = the whole corpus). Docs resembling
    * the target get positive weights; l49's temperature mix or l21's
    * sampler consume them as resampling scores.
    *
    * Scale shape: both models are BUCKET-sized (4096 rows), built by one
    * map-side-combined pass each and joined back as a broadcast — the
    * corpus never shuffles text, and the per-doc score is one doc_id-keyed
    * aggregation of (digest-join) numeric rows. Per-bucket log-ratios land
    * on the shared 9-sig grid before the per-doc mean (itself re-rounded),
    * so libm's ulp noise cannot leak into the compare.
    */
  def dsirWeights(s: SparkSession, dir: String, buckets: Int = 4096,
                  targetLang: String = "en"): DataFrame = {
    import s.implicits._
    val toks = Tables.load(s, dir, "documents")
      .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
      .select($"doc_id", $"lang",
        pmod(TextOps.strHash60($"tok"), lit(buckets.toLong)).as("b"))
      .cache()
    val raw = toks.groupBy($"b").agg(count(lit(1)).as("cr"))
    val tgt = toks.filter($"lang" === targetLang)
      .groupBy($"b").agg(count(lit(1)).as("ct"))
    val totals = raw.agg(sum($"cr").cast("double").as("nr")).crossJoin(
      tgt.agg(sum($"ct").cast("double").as("nt")))
    // Bucket-level smoothed log-ratio table: 4096 rows, broadcast back.
    val lr = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select($"b", graft.Canon.sig6(
        log10((coalesce($"ct", lit(0L)) + 1.0) / ($"nt" + buckets)) -
          log10(($"cr" + 1.0) / ($"nr" + buckets))).as("lr"))
    val out = toks.join(broadcast(lr), Seq("b"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        graft.Canon.sig6(avg($"lr")).as("dsir_w"))
    // Release the cache-manager entry before returning (KMeans.fitOn's
    // pattern) so the gate's pooled phase doesn't accumulate per-query
    // cached token relations. Measured cost of the early release (sf0.1
    // A/B, warm): 1.3 s vs 0.9 s kept-cached — the two broadcast-subquery
    // jobs race the rebuild of a few token partitions — accepted for
    // bounded block-manager residency across the 184-query pooled dump.
    toks.unpersist()
    out
  }

  /** Zipf rank–frequency fit: OLS slope/intercept of ln(freq) on ln(rank)
    * over the corpus's top `topK` tokens — the classic "is this corpus
    * natural-language-shaped" diagnostic (Zipf's law: slope ≈ −1; crawl
    * boilerplate and template spam bend the tail). Deterministic ranks
    * (count desc, token asc); both engines grid-round each ln() term
    * (l58's device) so the 100-term sums collapse onto shared doubles,
    * and the closed-form slope/intercept are computed FROM THE SUMS on
    * the identical formula.
    *
    * Scale posture: the token count is a map-side-combined groupBy; the
    * rank relation is TakeOrdered(topK) — constant rows — and the window
    * + regression run on those topK rows only. Nothing driver-side, no
    * corpus-global window.
    */
  def zipfFit(s: SparkSession, dir: String, topK: Int = 100): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val freq = Tables.load(s, dir, "documents")
      .select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val top = freq.orderBy($"cnt".desc, $"tok".asc).limit(topK)
    // Single-partition window over exactly topK rows — constant-sized by
    // construction, independent of corpus scale.
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy($"cnt".desc, $"tok".asc)))
    val xy = ranked.select(
      graft.Canon.sig6(log($"rank".cast("double"))).as("x"),
      graft.Canon.sig6(log($"cnt".cast("double"))).as("y"))
    xy.agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select(
        $"n".as("n_points"),
        graft.Canon.sig6(($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx")).as("slope"),
        graft.Canon.sig6(($"sy" * $"sxx" - $"sx" * $"sxy") /
          ($"n" * $"sxx" - $"sx" * $"sx")).as("intercept"))
  }
}
