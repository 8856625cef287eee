package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Canon.sig6Sql

/** Registry of the LLM-data-pipeline query surface (SURVEY §2.4 L1–L4 plus
  * scale-path variants). Oracle SQL mirrors each Spark plan in DuckDB —
  * including every sketch (MinHash/SimHash/SRP-LSH/IVF): their md5-derived
  * base hashes and integer/inlined-literal arithmetic reproduce verbatim in
  * SQL, so the oracles land the identical approximations, misses and all.
  */
object LlmQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l01_exact_dup_groups" -> ((s, dir) => Dedup.exactDupGroups(s, dir)),
    "l02_exact_dedup" -> ((s, dir) => Dedup.exactDedup(s, dir)),
    "l03_jaccard_pairs" -> ((s, dir) => Dedup.jaccardPairs(s, dir)),
    "l04_minhash_pairs" -> ((s, dir) => Dedup.minhashPairs(s, dir)),
    // The adaptive-banding HIGH-THRESHOLD operating point (rowsFor(0.85)
    // → 4×8 bands): near-exact duplicate scan with ~8× fewer candidate
    // collisions than l04's 8×4 curve would pass to the verifier.
    "l56_minhash_pairs_hi" -> ((s, dir) =>
      Dedup.minhashPairs(s, dir, threshold = 0.85)),
    "l50_incremental_minhash" -> ((s, dir) => Dedup.incrementalMinhash(s, dir)),
    "l05_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(s, dir)),
    "l06_cosine_topk" -> ((s, dir) => Similarity.cosineTopK(s, dir)),
    "l07_embed_dup" -> ((s, dir) => Similarity.embedDupPairs(s, dir)),
    // THRESHOLD-ADAPTIVE banding (r8-advice): the default call derives its
    // operating point from the 0.45 threshold via bandBitsFor — 8 bands ×
    // 6 bits, whose S-curve actually fires at the corpus's natural
    // cos≈0.47 pair regime (sidecar l08_recall_vs_l07 was 0.0 under the
    // old fixed 4×12; DedupSpec still pins the 4×12 profile's ≥0.9 recall
    // at hi-sim and its use at threshold ≥0.9).
    "l08_embed_dup_lsh" -> ((s, dir) => Similarity.embedDupPairsLsh(s, dir)),
    // Query-adaptive multi-probe LSH — l08's banding plus one
    // min-margin-flip probe per band (the mid-sim recall step).
    "l62_embed_dup_lsh_mp" -> ((s, dir) => Similarity.embedDupPairsLshMp(s, dir)),
    // The FIXED 8×6 mid-similarity point, retained as the regression pin
    // for the operating point the adaptive default now selects at 0.45
    // (the bench sidecar records l51_recall_vs_l07 every round; if the
    // adaptive rule drifts, l08 and l51 diverge loudly).
    "l51_embed_dup_lsh_mid" -> ((s, dir) =>
      Similarity.embedDupPairsLsh(s, dir, bandBits = 6)),
    // The APPLY twin of l39: tokens covered by cross-document duplicated
    // 8-gram spans are removed and the scrubbed text reassembled (Lee et
    // al. span-level dedup at fixed-gram granularity).
    "l52_span_scrub" -> ((s, dir) => Dedup.spanScrub(s, dir)),
    // Contamination FRACTION per doc against the benchmark slice (l26/l31
    // flag absolute counts; this is the GPT-3-style share-of-doc report).
    "l53_decontaminate_overlap" -> ((s, dir) =>
      Dedup.decontaminateOverlap(s, dir)),
    // DSIR hashed-unigram importance weights (target = English slice).
    "l54_dsir_weights" -> ((s, dir) => TextStats.dsirWeights(s, dir)),
    // Product-quantization ADC top-k — the third ANN tier beside l08 (LSH)
    // and l15 (IVF); per-subspace codebooks via the shared Lloyd.
    "l55_pq_topk" -> ((s, dir) => Similarity.pqTopK(s, dir)),
    // Top principal component by power iteration (C·v as X^T(Xv) — one
    // corpus aggregation per round, no covariance matrix, no shuffle) and
    // the corpus projected onto it — the whitening/anisotropy primitive.
    "l58_pca_project" -> ((s, dir) => Similarity.pcaPowerProject(s, dir)),
    // Greedy k-center (farthest-point) coreset selection — the
    // diversity-sampling dual of dedup; Gonzalez rounds with sig6-grid
    // distances so every pick replays in the oracle.
    "l63_kcenter_sample" -> ((s, dir) => Similarity.kcenterSample(s, dir)),
    // Maximal marginal relevance re-ranking — the RAG diversity cut over
    // the cosine candidate pool (λ·rel − μ·max-sim-to-selected, greedy).
    "l64_mmr_rerank" -> ((s, dir) => Similarity.mmrRerank(s, dir)),
    // Zipf rank–frequency OLS fit over the top-100 tokens — the
    // natural-language-shape diagnostic (TextStats.zipfFit).
    "l65_zipf_fit" -> ((s, dir) => TextStats.zipfFit(s, dir)),
    // Cluster-quota (balanced) coreset sampling: per-kmeans-cluster
    // deterministic md5 draw (Similarity.clusterQuotaSample).
    "l66_cluster_sample" -> ((s, dir) =>
      Similarity.clusterQuotaSample(s, dir)),
    // Tokenizer fertility by language under the corpus-trained BPE
    // vocabulary — the cross-lingual equity diagnostic
    // (TextStats.bpeFertility).
    "l67_bpe_fertility" -> ((s, dir) => TextStats.bpeFertility(s, dir)),
    // Embedding-space outliers: per-cluster z-scored centroid distance,
    // flagged tail (Similarity.embedOutliers).
    "l68_embed_outliers" -> ((s, dir) => Similarity.embedOutliers(s, dir)),
    // One-row corpus card: volume, breadth, exact-dup rate, mean tokens
    // (TextStats.corpusCard).
    "l69_corpus_card" -> ((s, dir) => TextStats.corpusCard(s, dir)),
    // Dedup-quality audit: l04's LSH pass scored against l03's exact twin
    // — recall/misses/spurious as one hash-gated row (TextOps.dedupAudit).
    "l70_dedup_audit" -> ((s, dir) => Dedup.dedupAudit(s, dir)),
    "l09_text_stats" -> ((s, dir) => TextStats.textStats(s, dir)),
    "l10_lang_dist" -> ((s, dir) => TextStats.langDist(s, dir)),
    "l11_token_counts" -> ((s, dir) => TextStats.tokenCounts(s, dir)),
    "l12_fingerprints" -> ((s, dir) => TextStats.fingerprints(s, dir)),
    "l13_langid" -> ((s, dir) => TextStats.langIdHeuristic(s, dir)),
    "l15_ivf_topk" -> ((s, dir) => Similarity.ivfTopK(s, dir)),
    "l16_quality_filter" -> ((s, dir) => TextStats.qualityFilter(s, dir)),
    "l17_top_ngrams" -> ((s, dir) => TextStats.topNgrams(s, dir)),
    "l18_mean_embedding" -> ((s, dir) => Similarity.meanEmbeddings(s, dir)),
    // End-to-end cleaning pipeline in ONE plan: quality filter → exact-dup
    // survivor selection → per-language corpus stats. The composition is
    // the point — each stage is a first-class operator above, and chaining
    // them stays a single Catalyst plan (filter pushes under the window).
    "l20_split_assign" -> ((s, dir) => Curation.splitAssign(s, dir)),
    "l21_stratified_sample" -> ((s, dir) => Curation.stratifiedSample(s, dir)),
    // Quality-weighted acceptance sampling — the soft middle ground
    // between l16's hard filter and l21's per-language quota.
    "l61_weighted_sample" -> ((s, dir) => Curation.weightedSample(s, dir)),
    "l22_pack_sequences" -> ((s, dir) => Curation.packSequences(s, dir)),
    "l23_redact_pii" -> ((s, dir) => Curation.redactPii(s, dir)),
    "l24_mix_rates" -> ((s, dir) => Curation.mixRates(s, dir)),
    "l27_unigram_logprob" -> ((s, dir) => TextStats.unigramLogProb(s, dir)),
    // CCNet head/middle/tail perplexity bucketing: per-language ranked
    // thirds of l27's LM score — the mixture-design table (Wenzek 2020).
    "l60_ppl_buckets" -> ((s, dir) => TextStats.pplBuckets(s, dir)),
    "l28_quantize_int8" -> ((s, dir) => Similarity.quantizeInt8(s, dir)),
    "l29_tfidf_top" -> ((s, dir) => TextStats.tfidfTop(s, dir)),
    "l30_repetition" -> ((s, dir) => TextStats.repetitionStats(s, dir)),
    "l31_decontaminate_bloom" -> ((s, dir) => Dedup.decontaminateBloom(s, dir)),
    "l32_bm25_topk" -> ((s, dir) => TextStats.bm25TopK(s, dir)),
    // Hard-negative mining (DPR-style): BM25 top-1 is the positive, its
    // Jaccard near-dups are excluded as false negatives, the next k docs
    // ship as contrastive-training negatives — l32 ∘ l03 ∘ anti-join.
    "l59_hard_negatives" -> ((s, dir) => TextStats.hardNegatives(s, dir)),
    "l33_hybrid_rrf" -> ((s, dir) => Similarity.hybridRrf(s, dir)),
    "l34_semantic_dedup" -> ((s, dir) => Similarity.semanticDedup(s, dir)),
    "l35_winnow_fingerprints" -> ((s, dir) => TextStats.winnowFingerprints(s, dir)),
    "l36_bpe_pair_counts" -> ((s, dir) => TextStats.bpePairCounts(s, dir)),
    "l37_chunk_stride" -> ((s, dir) => Curation.chunkStride(s, dir)),
    "l38_char_entropy" -> ((s, dir) => TextStats.charEntropy(s, dir)),
    "l39_dup_span_frac" -> ((s, dir) => Dedup.dupSpanFrac(s, dir)),
    // The end-of-pipeline keep/drop DECISION: all four quality families —
    // rule-based (l16), repetition (l30), statistical LM score (l27), and
    // char entropy (l38) — fused into one Catalyst plan with a single
    // auditable verdict per document (first failing family, in a fixed
    // order). Each signal keeps its own operator's exact semantics; the
    // joins are doc_id-co-partitioned aggregations, so the composition
    // adds no new shuffle shape. Thresholds compare either integer-exact
    // ratios (top_tok_frac) or grid-rounded values (logprob, entropy), so
    // no libm noise can flip a verdict across engines.
    "l40_quality_fused" -> ((s, dir) => TextStats.fusedQuality(s, dir)),
    // The end-to-end curation pipeline as ONE query: exact dedup → fused
    // quality gate → near-dup cluster removal → decontamination, reported
    // as a per-stage (docs, tokens) funnel — the composition a real user
    // runs, built from the library's own component operators.
    "l57_curation_funnel" -> ((s, dir) => Curation.curationFunnel(s, dir)),
    // Corpus-composition analysis: pairwise source 8-gram Jaccard — which
    // sources mirror each other (and would be double-counted by l24's
    // mixture weights).
    "l41_source_overlap" -> ((s, dir) => Dedup.sourceOverlap(s, dir)),
    // BPE tokenizer TRAINING: three real merge rounds over the collapsed
    // vocabulary (l36 counts one round's pairs; this picks, applies, and
    // iterates — returning the merge table a tokenizer ships).
    "l42_bpe_train" -> ((s, dir) => TextStats.bpeTrain(s, dir)),
    // Bigram LM quality score — l27's unigram ladder rung up: phrase-level
    // fluency, not just word rarity.
    "l43_bigram_logprob" -> ((s, dir) => TextStats.bigramLogProb(s, dir)),
    // BPE tokenizer ENCODE: l42's trained merges applied back to the
    // corpus — per-doc char and BPE-token counts, the compression-ratio
    // curation signal.
    "l45_bpe_encode" -> ((s, dir) => TextStats.bpeEncode(s, dir)),
    // Vocabulary coverage: per-language OOV rate under the corpus's own
    // top-1000 token vocabulary — the tokenizer-design starvation check.
    "l46_vocab_coverage" -> ((s, dir) => TextStats.vocabCoverage(s, dir)),
    // Language confusion matrix: declared lang × l13's language-ID vote —
    // the audit that shows WHERE a lang classifier and the corpus metadata
    // disagree before either is trusted for mixture planning.
    "l48_lang_confusion" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      TextStats.langIdHeuristic(s, dir)
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
    }),
    // Temperature mixture rates (α = 0.5): keep probability ∝ n^(α−1)
    // normalized to the smallest source — the multilingual sampling
    // interpolation between proportional and uniform that l24's full
    // flattening is the α = 0 extreme of.
    "l49_temperature_mix" -> ((s, dir) => Curation.temperatureMix(s, dir)),
    // Per-source quota: keep each source's k longest documents via the
    // bounded TopKAgg (map-side-partial constant state), not a
    // corpus-sorting window — the per-domain cap of crawl pipelines.
    "l47_source_quota" -> ((s, dir) => Curation.sourceQuota(s, dir)),
    // Near-dup dedup MATERIALIZED: l25 reports the clusters; this applies
    // them — survivor = each cluster's min doc_id (the WCC label itself),
    // singletons all survive — and reports the post-dedup corpus by lang.
    // The end-to-end "what actually ships to training" near-dedup step.
    "l44_neardup_dedup" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val pairs = Dedup.jaccardPairs(s, dir)
        .select($"doc_a".as("src"), $"doc_b".as("dst"))
      val lab = graft.graphs.GraphOps.wcc(s, pairs)
      val docs = graft.Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang",
          size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
      docs.join(lab, docs("doc_id") === lab("id"), "left")
        .filter($"id".isNull || $"doc_id" === $"comp")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"))
    }),
    // Benchmark decontamination: the train/test-overlap scan (see
    // Dedup.decontaminate — benchmark shingles broadcast, corpus never
    // shuffles).
    "l26_decontaminate" -> ((s, dir) => Dedup.decontaminate(s, dir)),
    // The canonical near-dup pipeline ENDING: similarity pairs are only
    // candidates — transitive duplicates (A~B, B~C) must land in one
    // cluster, so the pair graph goes through connected components and each
    // cluster keeps min(doc_id) as survivor. Composes the llmops pair
    // generation with the graph engine's WCC in one plan.
    "l25_neardup_clusters" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val pairs = Dedup.jaccardPairs(s, dir)
        .select($"doc_a".as("src"), $"doc_b".as("dst"))
      graft.graphs.GraphOps.wcc(s, pairs)
        .groupBy($"comp".as("cluster"))
        .agg(count(lit(1)).as("n_docs"))
    }),
    "l19_clean_corpus" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val kept = TextStats.qualityFilter(s, dir).filter($"keep")
        .select($"doc_id", $"n_tokens")
      val docs = graft.Tables.load(s, dir, "documents")
        .join(kept, "doc_id")
      val w = Window.partitionBy(md5($"text")).orderBy($"doc_id")
      docs.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"))
    }),
  )

  /** Aggregated oracle registry — entries live in [[LlmOraclesA]] /
    * [[LlmOraclesB]] (file-size split); shared CTE builders in
    * [[LlmOracleHelpers]]. Keys and SQL unchanged.
    */
  val oracles: Map[String, String] = LlmOraclesA.oracles ++ LlmOraclesB.oracles
}
