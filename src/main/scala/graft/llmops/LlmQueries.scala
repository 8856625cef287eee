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
    "l50_incremental_minhash" -> ((s, dir) => Dedup.incrementalMinhash(s, dir)),
    "l05_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(s, dir)),
    "l06_cosine_topk" -> ((s, dir) => Similarity.cosineTopK(s, dir)),
    "l07_embed_dup" -> ((s, dir) => Similarity.embedDupPairs(s, dir)),
    "l08_embed_dup_lsh" -> ((s, dir) => Similarity.embedDupPairsLsh(s, dir)),
    // The MID-SIMILARITY operating point of the same SRP sketch: 8 bands
    // × 6 bits (vs l08's 4×12). Per-band agreement needs p^6 not p^12,
    // so recall at the production threshold's cos≈0.5 regime is ~0.5
    // where l08's is ~0 by design — paid for with ~8× the candidate
    // volume (64 buckets/band). Same signatures, same exact verify; the
    // bench sidecar records l51_recall_vs_l07 every round.
    "l51_embed_dup_lsh_mid" -> ((s, dir) =>
      Similarity.embedDupPairsLsh(s, dir, bandBits = 6)),
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
    "l22_pack_sequences" -> ((s, dir) => Curation.packSequences(s, dir)),
    "l23_redact_pii" -> ((s, dir) => Curation.redactPii(s, dir)),
    "l24_mix_rates" -> ((s, dir) => Curation.mixRates(s, dir)),
    "l27_unigram_logprob" -> ((s, dir) => TextStats.unigramLogProb(s, dir)),
    "l28_quantize_int8" -> ((s, dir) => Similarity.quantizeInt8(s, dir)),
    "l29_tfidf_top" -> ((s, dir) => TextStats.tfidfTop(s, dir)),
    "l30_repetition" -> ((s, dir) => TextStats.repetitionStats(s, dir)),
    "l31_decontaminate_bloom" -> ((s, dir) => Dedup.decontaminateBloom(s, dir)),
    "l32_bm25_topk" -> ((s, dir) => TextStats.bm25TopK(s, dir)),
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
    "l40_quality_fused" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val rules = TextStats.qualityFilter(s, dir)
        .select($"doc_id", $"reason".as("rule_reason"))
      val rep = TextStats.repetitionStats(s, dir)
        .select($"doc_id", $"top_tok_frac")
      val lm = TextStats.unigramLogProb(s, dir)
        .select($"doc_id", $"logprob")
      val ent = TextStats.charEntropy(s, dir)
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
    }),
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

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared MinHash CTE chain (shingle hashes → mod-P permuted signatures →
    * per-doc shingle counts → 8×4 band keys) for the l04 / l50 oracles:
    * the base hash is md5-derived (TextOps.strHash60 — bit-identical in
    * DuckDB), the 32 permutations are (a·h + b) mod 2³¹−1 integer
    * arithmetic with the literal (a, b) table inlined from MinHashSig, and
    * band keys are the raw 4-value signature slices — so candidate
    * generation (recall curve and all) and the exact-Jaccard verification
    * land identical rows on both engines. lazy: toksSql must initialize
    * first.
    */
  private lazy val minhashCtes: String = {
    val P = graft.functions.MinHashSig.P
    val perms = (0 until 32).map(i =>
      s"($i, ${graft.functions.MinHashSig.permA(i)}, " +
        s"${graft.functions.MinHashSig.permB(i)})").mkString(", ")
    val shingle = "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]"
    s"""WITH toks AS (SELECT doc_id, $toksSql AS ws FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, ${TextOps.strHash60Sql(s"($shingle)")} AS h
       |  FROM toks, unnest(range(1, len(ws) - 2)) t(i)),
       |perms(pid, pa, pb) AS (VALUES $perms),
       |sig AS (
       |  SELECT doc_id, pid, min((pa * (h % $P) + pb) % $P) AS mh
       |  FROM sh, perms GROUP BY doc_id, pid),
       |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, pid // 4 AS band_id, list(mh ORDER BY pid) AS bkey
       |  FROM sig GROUP BY doc_id, pid // 4)""".stripMargin
  }

  /** Shared BPE merge-round CTE chain for the l42 (train) / l45 (encode)
    * oracles. Words are VARCHAR[] symbol lists; each round counts adjacent
    * pairs (`p\$r`), picks the top merge with the Spark side's exact
    * tie-break (`t\$r`), and applies it with window functions (`s/m/v\$r`).
    *
    * The greedy leftmost fold has a closed form that needs no fold at all:
    * a position is a merge CANDIDATE iff (sym[i], sym[i+1]) = (a, b). For
    * a ≠ b candidates can never be adjacent (that would force a = b), so
    * every candidate merges; for a = b candidates chain within runs of
    * `a`s and greedy takes the odd-ranked ones in each consecutive run.
    * So: gaps-and-islands over the candidate flag, merge at odd rank,
    * drop the following (consumed) symbol, reassemble with list(ORDER BY).
    *
    * Written this way for cross-version robustness: the previous
    * list_reduce string-accumulator fold and `string_split(tok, '')`
    * empty-separator char split are exactly the constructs whose semantics
    * have drifted across DuckDB releases (the round-5 gate failed l42 on a
    * DuckDB where the local 1.0.0 mirror passed). Everything here —
    * substring, range+unnest, ROW_NUMBER/lag, list(ORDER BY) — is stable
    * SQL. pair_count is CAST to BIGINT because DuckDB types sum() as
    * HUGEINT, which reaches pandas as float64 and renders differently
    * from Spark's int64 under str()-style canonicalizers.
    */
  private def bpeOracleCtes(rounds: Int): String = {
    def lvl(r: Int): String = {
      val p = r - 1
      s"""p$r AS (
         |  SELECT ss[i] AS a, ss[i + 1] AS b,
         |         CAST(sum(cnt) AS BIGINT) AS pair_count
         |  FROM v$p, unnest(range(1, len(ss))) t(i)
         |  GROUP BY 1, 2),
         |t$r AS (SELECT $r AS round, a AS sym_a, b AS sym_b,
         |               a || b AS merged, pair_count
         |        FROM p$r ORDER BY pair_count DESC, a, b LIMIT 1),
         |s$r AS (
         |  SELECT v.tok, v.cnt, u.i, v.ss[u.i] AS sym, t.merged AS mg,
         |         (t.sym_a IS NOT NULL AND v.ss[u.i] = t.sym_a
         |            AND u.i < len(v.ss) AND v.ss[u.i + 1] = t.sym_b) AS c
         |  FROM v$p v LEFT JOIN t$r t ON TRUE,
         |       unnest(range(1, len(v.ss) + 1)) u(i)),
         |m$r AS (
         |  SELECT tok, cnt, i, sym, mg,
         |         c AND (ROW_NUMBER() OVER (
         |             PARTITION BY tok, c, i - rnc ORDER BY i) % 2 = 1)
         |           AS mstart
         |  FROM (SELECT *, ROW_NUMBER() OVER (
         |            PARTITION BY tok, c ORDER BY i) AS rnc
         |        FROM s$r) z$r),
         |v$r AS (
         |  SELECT tok,
         |         list(CASE WHEN mstart THEN mg ELSE sym END ORDER BY i) AS ss,
         |         cnt
         |  FROM (SELECT tok, cnt, i, sym, mg, mstart,
         |               coalesce(lag(mstart) OVER (
         |                   PARTITION BY tok ORDER BY i), FALSE) AS consumed
         |        FROM m$r) y$r
         |  WHERE NOT consumed
         |  GROUP BY tok, cnt)""".stripMargin
    }
    s"""toks AS (SELECT unnest($toksSql) AS tok FROM documents),
       |w0 AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
       |v0 AS (
       |  SELECT tok, list(substring(tok, i, 1) ORDER BY i) AS ss, cnt
       |  FROM w0, unnest(range(1, length(tok) + 1)) t(i)
       |  GROUP BY tok, cnt),
       |${(1 to rounds).map(lvl).mkString(",\n")}""".stripMargin
  }

  /** The l13 language-ID argmax (scored marker evidence per candidate,
    * row_number tie-break matching the Spark sort_array descending-struct
    * order). Shared by l13 (per-doc votes) and l48 (confusion matrix).
    */
  private val langIdOracle: String =
    s"""WITH t AS (SELECT doc_id, lang, $toksSql AS ws FROM documents),
       |sc AS (
       |  SELECT doc_id, lang, 'en' AS cand,
       |         CAST(len(list_filter(ws, w -> w IN ('the','and','of'))) AS DOUBLE) AS score FROM t
       |  UNION ALL SELECT doc_id, lang, 'es',
       |         CAST(len(list_filter(ws, w -> w IN ('el','la','de'))) AS DOUBLE) FROM t
       |  UNION ALL SELECT doc_id, lang, 'fr',
       |         CAST(len(list_filter(ws, w -> w IN ('le','la','et'))) AS DOUBLE) FROM t
       |  UNION ALL SELECT doc_id, lang, 'de',
       |         CAST(len(list_filter(ws, w -> w IN ('der','die','und'))) AS DOUBLE) FROM t
       |  UNION ALL SELECT doc_id, lang, 'zh', 0.0 FROM t)
       |SELECT doc_id, lang, cand AS lang_pred FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
       |  FROM sc) x WHERE rn = 1""".stripMargin

  /** l03's jaccard-pair relation fed through the g04-style min-label
    * closure: `lab(id, comp)` labels every clustered doc with its
    * cluster's min doc_id. Shared by l25 (cluster report) and l44 (the
    * applied dedup — survivors + singletons).
    */
  private val neardupLabCtes: String =
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, $toksSql AS ws FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id,
       |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
       |  FROM toks, unnest(range(1, len(ws) - 2)) t(i)
       |), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pr AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  JOIN cnt ca ON ca.doc_id = doc_a
       |  JOIN cnt cb ON cb.doc_id = doc_b
       |  WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5),
       |ue AS (SELECT doc_a AS src, doc_b AS dst FROM pr
       |       UNION SELECT doc_b, doc_a FROM pr),
       |cc AS (
       |  SELECT DISTINCT src AS id, src AS comp FROM ue
       |  UNION
       |  SELECT ue.dst, cc.comp FROM cc JOIN ue ON ue.src = cc.id
       |  WHERE cc.comp < ue.dst
       |),
       |lab AS (SELECT id, min(comp) AS comp FROM cc GROUP BY id)""".stripMargin

  /** 8-gram overlap between the corpus slice and the benchmark slice;
    * argmax benchmark doc per contaminated corpus doc, ties to smallest id.
    * Shared by l26 (exact) and l31 (bloom-pruned + exact-verified — false
    * positives are removed, so the final relation is identical).
    */
  private val decontOracle: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS ws FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
       |           || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6]
       |           || ' ' || ws[i+7] AS s
       |  FROM toks, unnest(range(1, len(ws) - 6)) t(i)),
       |j AS (
       |  SELECT c.doc_id AS doc_id, b.doc_id AS bench_id, count(*) AS shared
       |  FROM sh c JOIN sh b ON c.s = b.s
       |  WHERE c.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT doc_id, shared AS n_shared, bench_id,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY shared DESC, bench_id ASC) AS rn
       |  FROM j)
       |SELECT doc_id, n_shared, bench_id FROM best
       |WHERE rn = 1 AND n_shared >= 2""".stripMargin

  /** The SRP-LSH oracle (l08/l51), parameterized by band width — the SQL
    * twin of [[Similarity.embedDupPairsLsh]]'s `bandBits` operating-point
    * knob. Threshold fixed at the production 0.45 on both sides.
    */
  private def srpLshOracle(bandBits: Int): String = {
    val bands = Similarity.Planes / bandBits
    val mask = (1L << bandBits) - 1
    val planeRows = Similarity.planes.zipWithIndex.map { case (pl, p) =>
      val vals = pl.map(x =>
        String.format(java.util.Locale.ROOT, "%.17e", Double.box(x)))
      s"($p, [${vals.mkString(", ")}])"
    }.mkString(",\n")
    s"""WITH pl(p, pv) AS (VALUES
       |$planeRows),
       |e AS (SELECT vec_id,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM embeddings),
       |sg AS (
       |  SELECT vec_id,
       |         CAST(sum(CASE WHEN list_inner_product(e.v, pl.pv) >= 0
       |                       THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
       |              AS BIGINT) AS sig
       |  FROM e, pl GROUP BY vec_id),
       |bands AS (
       |  SELECT vec_id, b AS band_id,
       |         (sig >> ($bandBits * CAST(b AS INT))) & $mask AS band_key
       |  FROM sg, unnest(range($bands)) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key
       |    AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, sim FROM (
       |  SELECT c.vec_a, c.vec_b,
       |         ${sig6Sql("list_cosine_similarity(ea.v, eb.v)")} AS sim
       |  FROM cand c
       |  JOIN e ea ON ea.vec_id = c.vec_a
       |  JOIN e eb ON eb.vec_id = c.vec_b) t
       |WHERE sim >= 0.45""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "l01_exact_dup_groups" ->
      """SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "l02_exact_dedup" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) t WHERE rn = 1""".stripMargin,
    "l03_jaccard_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS ws FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
         |  FROM toks, unnest(range(1, len(ws) - 2)) t(i)
         |), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) AS jaccard
         |FROM pairs
         |JOIN cnt ca ON ca.doc_id = doc_a
         |JOIN cnt cb ON cb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5""".stripMargin,
    // MinHash+LSH reproduced EXACTLY: the base hash is md5-derived
    // (TextOps.strHash60 — bit-identical in DuckDB), the 32 permutations
    // are (a·h + b) mod 2³¹−1 integer arithmetic with the literal (a, b)
    // table inlined from MinHashSig, and the band keys are the raw 4-value
    // signature slices — so candidate generation (recall curve and all)
    // and the exact-Jaccard verification land the identical rows.
    "l04_minhash_pairs" ->
      s"""$minhashCtes,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.bkey = b.bkey
         |    AND a.doc_id < b.doc_id),
         |ix AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       CAST(inter AS DOUBLE)/(na.n + nb.n - inter) AS jaccard
         |FROM ix JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE)/(na.n + nb.n - inter) >= 0.5""".stripMargin,
    // The incremental variant restates the SAME pipeline with candidate
    // generation restricted to cross-split pairs (corpus % 5 <> 0 joined
    // to batch % 5 = 0) — per-doc signatures are per-doc aggregates, so
    // computing them over the full table and filtering the join equals
    // the Spark side's split-then-sign.
    "l50_incremental_minhash" ->
      s"""$minhashCtes,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS corpus_doc, b.doc_id AS batch_doc
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.bkey = b.bkey
         |   AND a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0),
         |ix AS (
         |  SELECT c.corpus_doc, c.batch_doc, count(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.corpus_doc
         |  JOIN sh b ON b.doc_id = c.batch_doc AND b.h = a.h
         |  GROUP BY 1, 2)
         |SELECT corpus_doc, batch_doc,
         |       CAST(inter AS DOUBLE)/(na.n + nb.n - inter) AS jaccard
         |FROM ix JOIN n na ON na.doc_id = corpus_doc
         |        JOIN n nb ON nb.doc_id = batch_doc
         |WHERE CAST(inter AS DOUBLE)/(na.n + nb.n - inter) >= 0.5""".stripMargin,
    // SimHash reproduced exactly: md5-60 token hashes (multiset, not
    // distinct — each occurrence votes), strict-majority bit votes, 4×16-bit
    // band blocking, xor-popcount hamming verify. Bits 60-63 of the 60-bit
    // hash are always clear (vote sum = −n < 0), so range(60) is exact.
    "l05_simhash_pairs" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |th AS (SELECT doc_id, ${TextOps.strHash60Sql("tok")} AS h FROM tk),
         |bits AS (
         |  SELECT doc_id, b,
         |         CASE WHEN sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
         |              THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END AS bit
         |  FROM th, unnest(range(60)) t(b)
         |  GROUP BY doc_id, b),
         |sg AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sig
         |       FROM bits GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, sig, b AS band_id,
         |         (sig >> (16 * CAST(b AS INT))) & 65535 AS band_key
         |  FROM sg, unnest(range(4)) t(b))
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         |FROM bands a JOIN bands b
         |  ON a.band_id = b.band_id AND a.band_key = b.band_key
         |  AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 6""".stripMargin,
    "l06_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |sims AS (
         |  SELECT query_id, e.vec_id,
         |         ${sig6Sql("list_cosine_similarity(qv, e.embedding::DOUBLE[])")} AS sim
         |  FROM q JOIN embeddings e ON e.vec_id <> query_id)
         |SELECT query_id, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY sim DESC, vec_id) AS rn
         |  FROM sims) t WHERE rn <= 10""".stripMargin,
    "l07_embed_dup" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         ${sig6Sql("list_cosine_similarity(a.v, b.v)")} AS sim
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, sim FROM s WHERE sim >= 0.45""".stripMargin,
    "l09_text_stats" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS ws FROM documents)
         |SELECT doc_id, lang,
         |       CAST(length(text) AS BIGINT) AS chars,
         |       CAST(len(ws) AS BIGINT) AS n_tokens,
         |       CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
         |       CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
         |         / greatest(len(ws), 1) AS stop_ratio,
         |       CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS DOUBLE)
         |         / greatest(len(ws), 1) AS mean_tok_len
         |FROM t""".stripMargin,
    "l10_lang_dist" ->
      s"""SELECT lang, count(*) AS n_docs,
         |       ${sig6Sql("avg(length(text))")} AS avg_chars
         |FROM documents GROUP BY lang""".stripMargin,
    "l11_token_counts" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpeish,
        |       len(regexp_extract_all(text, '[a-z]+')) AS n_words
        |FROM documents""".stripMargin,
    "l12_fingerprints" ->
      """SELECT DISTINCT doc_id, md5(substr(text, i, 8)) AS fp
        |FROM documents, unnest(range(1, length(text) - 6)) t(i)
        |WHERE substr(md5(substr(text, i, 8)), 32, 1) IN ('0', '1')""".stripMargin,
    // Marker-scoring language ID: per candidate language, count of its
    // marker tokens; argmax with the Spark side's exact tie order (score
    // DESC, then candidate code DESC — the struct sort in langIdHeuristic).
    "l13_langid" -> langIdOracle,
    // The same argmax relation rolled up to the (declared, predicted)
    // matrix.
    "l48_lang_confusion" ->
      s"""WITH pred AS ($langIdOracle)
         |SELECT lang, lang_pred, count(*) AS n_docs
         |FROM pred GROUP BY lang, lang_pred""".stripMargin,
    // The exponent interpolates from the SAME constant the Spark side
    // defaults to (Curation.TempAlpha) — a tuned temperature cannot
    // desynchronize the oracle.
    "l49_temperature_mix" -> {
      val ex = s"pow(CAST(n_min AS DOUBLE) / n, ${1.0 - Curation.TempAlpha})"
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |m AS (SELECT min(n) AS n_min FROM c)
         |SELECT source, n,
         |       ${graft.Canon.sig6Sql(ex)} AS rate,
         |       ${graft.Canon.sig6Sql(s"$ex * n")} AS expected_docs
         |FROM c, m""".stripMargin
    },
    // The quota relation is small (sources x k), so the oracle can afford
    // the window form the Spark side deliberately avoids — their equality
    // is exactly the "aggregate ≡ sort-then-take" claim. k interpolates
    // from the SAME constant the Spark side defaults to.
    "l47_source_quota" ->
      s"""SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, n_chars FROM (
         |  SELECT source, doc_id, n_chars,
         |         row_number() OVER (PARTITION BY source
         |                            ORDER BY n_chars DESC, doc_id) AS rank
         |  FROM documents) t
         |WHERE rank <= ${Curation.QuotaK}""".stripMargin,
    "l16_quality_filter" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
         |         CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter($toksSql,
         |           w -> w IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
         |           / greatest(len($toksSql), 1) AS stop_ratio
         |  FROM documents)
         |SELECT doc_id, chars, n_tokens,
         |       CASE WHEN chars < 150 THEN 'too_short'
         |            WHEN n_tokens < 20 THEN 'few_tokens'
         |            WHEN stop_ratio > 0.45 THEN 'stopword_heavy'
         |            ELSE 'ok' END AS reason,
         |       (CASE WHEN chars < 150 THEN 'too_short'
         |            WHEN n_tokens < 20 THEN 'few_tokens'
         |            WHEN stop_ratio > 0.45 THEN 'stopword_heavy'
         |            ELSE 'ok' END = 'ok') AS keep
         |FROM t""".stripMargin,
    "l17_top_ngrams" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS ws FROM documents),
         |ng AS (
         |  SELECT ws[i] || ' ' || ws[i+1] AS ngram
         |  FROM t, unnest(range(1, len(ws))) u(i))
         |SELECT ngram, count(*) AS cnt FROM ng GROUP BY ngram
         |ORDER BY cnt DESC, ngram ASC LIMIT 20""".stripMargin,
    // Scalar (label, i, mean_val) rows — the gate's pandas canonicalizer
    // sorts column values, so no list-typed cells may reach it.
    "l18_mean_embedding" ->
      s"""WITH d AS (
         |  SELECT label, i, avg(embedding[i]::DOUBLE) AS m
         |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
         |  GROUP BY 1, 2)
         |SELECT label, CAST(i AS BIGINT) AS i, ${graft.Canon.sig6Sql("m")} AS mean_val
         |FROM d""".stripMargin,
    // The portable deterministic bucket: first 8 md5 hex digits as an int,
    // mod 100 — byte-identical in Spark (conv) and DuckDB (0x cast).
    "l20_split_assign" ->
      """SELECT doc_id, bucket,
        |       CASE WHEN bucket < 90 THEN 'train'
        |            WHEN bucket < 95 THEN 'validation'
        |            ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        |  FROM documents) t""".stripMargin,
    "l21_stratified_sample" ->
      """SELECT doc_id, lang, bucket FROM (
        |  SELECT doc_id, lang,
        |         CAST(concat('0x', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        |  FROM documents) t
        |WHERE bucket < (CASE lang WHEN 'en' THEN 40 WHEN 'es' THEN 60
        |                          WHEN 'fr' THEN 80 ELSE 100 END)""".stripMargin,
    "l22_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |         CAST(concat('0x', substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS shard
         |  FROM documents),
         |o AS (
         |  SELECT lang, shard, n_tokens,
         |         sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id)
         |           - n_tokens AS off
         |  FROM t)
         |SELECT lang, shard, CAST(floor(off / 2048) AS BIGINT) AS chunk_id,
         |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
         |FROM o GROUP BY 1, 2, 3""".stripMargin,
    "l23_redact_pii" ->
      """SELECT doc_id,
        |       regexp_replace(
        |         regexp_replace(text,
        |           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+',
        |           '<EMAIL>', 'g'),
        |         '[0-9]+', '<NUM>', 'g') AS clean_text,
        |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums
        |FROM documents""".stripMargin,
    "l24_mix_rates" ->
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
         |SELECT source, n,
         |       ${sig6Sql("least(1.0::DOUBLE, (sum(n) OVER ()) / ((count(*) OVER ()) * n))")} AS rate
         |FROM c""".stripMargin,
    // Mean unigram log10-probability per doc under the corpus's own
    // unigram model (CCNet-style statistical quality score).
    "l27_unigram_logprob" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |freq AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
         |n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM freq)
         |SELECT doc_id, count(*) AS n_tokens,
         |       ${sig6Sql("avg(log10(cnt / n.n))")} AS logprob
         |FROM tk JOIN freq USING (tok), n
         |GROUP BY doc_id""".stripMargin,
    // Int8 scalar quantization: identical IEEE double arithmetic on both
    // sides; round() ties differ only at exact .5 (HALF_UP vs away-from-
    // zero), which agree for the non-negative arguments here.
    "l28_quantize_int8" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx,
         |             (list_max(v) - list_min(v)) / 255.0 AS scale
         |      FROM e)
         |SELECT vec_id, mn, mx,
         |       CASE WHEN scale = 0 THEN 0.0 ELSE ${sig6Sql(
             "list_sum(list_transform(v, x -> " +
               "(mn + round((x - mn)/scale)*scale - x) * " +
               "(mn + round((x - mn)/scale)*scale - x))) / len(v)")} END AS mse
         |FROM b""".stripMargin,
    // Top TF-IDF term per doc: integer-only argmax (tf DESC, df ASC, term
    // ASC) so libm ln() differences can't flip the selection; the reported
    // score is rounded afterwards.
    "l29_tfidf_top" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
         |r AS (
         |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |         row_number() OVER (PARTITION BY tf.doc_id
         |                            ORDER BY tf.tf DESC, df.df ASC, tf.tok ASC) AS rn
         |  FROM tf JOIN df USING (tok))
         |SELECT doc_id, tok AS top_term, tf, df,
         |       ${sig6Sql("tf * ln(nd.nd / df)")} AS tfidf
         |FROM r, nd WHERE rn = 1""".stripMargin,
    // BM25 over integral tf/df/dl with the 9-sig rounding applied BEFORE
    // the top-k cut (see TextStats.bm25TopK) — both engines rank identical
    // doubles, doc_id breaks ties, so the LIMIT boundary cannot flip.
    "l32_bm25_topk" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
         |       WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(ln((st.nd - df.df + 0.5) / (df.df + 0.5) + 1.0) *
         |             (tf.tf * 2.2) /
         |             (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS raw
         |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), st
         |  GROUP BY tf.doc_id)
         |SELECT doc_id, ${sig6Sql("raw")} AS score
         |FROM sc ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // RRF fusion of the BM25 pool and the cosine pool (see
    // Similarity.hybridRrf): both legs rank 9-sig-rounded scores with id
    // tie-breaks, so pools/ranks are identical integers in both engines
    // and the fused score is exact-integer division in double.
    "l33_hybrid_rrf" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
         |       WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(ln((st.nd - df.df + 0.5) / (df.df + 0.5) + 1.0) *
         |             (tf.tf * 2.2) /
         |             (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS raw
         |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), st
         |  GROUP BY tf.doc_id),
         |lex AS (SELECT doc_id, ${sig6Sql("raw")} AS score FROM sc
         |        ORDER BY score DESC, doc_id LIMIT 100),
         |lr AS (SELECT doc_id,
         |              row_number() OVER (ORDER BY score DESC, doc_id) AS lrank
         |       FROM lex),
         |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |sims AS (
         |  SELECT vec_id,
         |         ${sig6Sql("list_cosine_similarity(qv, embedding::DOUBLE[])")} AS sim
         |  FROM embeddings, q WHERE vec_id <> 0),
         |vp AS (SELECT vec_id, sim FROM sims ORDER BY sim DESC, vec_id LIMIT 100),
         |vr AS (SELECT vec_id AS doc_id,
         |              row_number() OVER (ORDER BY sim DESC, vec_id) AS vrank
         |       FROM vp)
         |SELECT doc_id, lrank, vrank, rrf FROM (
         |  SELECT coalesce(lr.doc_id, vr.doc_id) AS doc_id, lr.lrank, vr.vrank,
         |         ${sig6Sql("coalesce(1.0/(60 + lr.lrank), 0) + coalesce(1.0/(60 + vr.vrank), 0)")} AS rrf
         |  FROM lr FULL JOIN vr ON vr.doc_id = lr.doc_id) t
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    // Kmeans-blocked cosine near-dup: the blocking IS l14's statically
    // unrolled Lloyd (shared CTEs), so DuckDB reproduces the identical
    // cells, then the same within-cell pair scan + sig6 cosine verify.
    "l34_semantic_dedup" -> {
      val (ctes, fin) = graft.algos.KMeans.lloydAssignCtes(k = 8, iters = 5, dim = 64)
      s"""WITH $ctes,
         |s AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         ${sig6Sql("list_cosine_similarity(a.v, b.v)")} AS sim
         |  FROM $fin a JOIN $fin b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, sim FROM s WHERE sim >= 0.35""".stripMargin
    },
    // SRP-LSH embedding dedup reproduced exactly: the 48 fixed hyperplanes
    // are inlined as DOUBLE literals (scientific notation — DuckDB parses
    // plain decimals as DECIMAL, silently changing the arithmetic; 17
    // significant digits round-trip the exact IEEE values), the sign bits
    // come from the same sequential dot products (bit-identical across
    // engines — the l06/l07 cosine oracles pin that), and banding/verify
    // are integer and sig6-rounded arithmetic. As with l04/l15, the
    // sub-unit recall is the method's, not the engine's — both engines
    // miss the identical cross-bucket pairs.
    "l08_embed_dup_lsh" -> srpLshOracle(bandBits = 12),
    // Same plane literals and signature CTEs, re-banded 8×6 — the mid-sim
    // operating point reproduces its EXTRA bucket collisions (and their
    // verified survivors) identically in DuckDB.
    "l51_embed_dup_lsh_mid" -> srpLshOracle(bandBits = 6),
    // IVF approximate top-k reproduced exactly: the coarse quantizer is
    // l14's statically unrolled Lloyd (shared CTEs — `c5` is the trained
    // centroid relation after 5 rounds, `a6` the final assignment), probe
    // ranking uses the same raw d² = |c|²−2q·c doubles (bit-identical:
    // both engines run sequential dot products over identical operands),
    // and the within-list scan ranks the same sig6-rounded cosines. The
    // sub-unit recall vs l06 is a PROPERTY of the method, not an engine
    // artifact — both engines miss the identical neighbors.
    "l15_ivf_topk" -> {
      val (ctes, fin) = graft.algos.KMeans.lloydAssignCtes(k = 8, iters = 5, dim = 64)
      val sig = graft.Canon.sig6Sql _
      s"""WITH $ctes,
         |e AS (
         |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm
         |  FROM pts),
         |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm
         |      FROM e WHERE vec_id < 5),
         |probes AS (
         |  SELECT query_id, qv, qnorm, cluster FROM (
         |    SELECT q.query_id, q.qv, q.qnorm, c.cluster,
         |           row_number() OVER (PARTITION BY q.query_id
         |             ORDER BY list_inner_product(c.c, c.c)
         |                      - 2 * list_inner_product(q.qv, c.c),
         |               c.cluster) AS rn
         |    FROM q, c5 c) t
         |  WHERE rn <= 3),
         |lists AS (
         |  SELECT a.cluster, e.vec_id, e.v, e.norm
         |  FROM $fin a JOIN e USING (vec_id)),
         |sims AS (
         |  SELECT p.query_id, l.vec_id,
         |         ${sig("list_inner_product(p.qv, l.v) / (p.qnorm * l.norm)")} AS sim
         |  FROM probes p JOIN lists l USING (cluster)
         |  WHERE l.vec_id <> p.query_id)
         |SELECT query_id, vec_id, sim FROM (
         |  SELECT query_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY sim DESC, vec_id) AS rn
         |  FROM sims) t
         |WHERE rn <= 10""".stripMargin
    },
    // Winnowing reproduced exactly: the same polynomial hash unrolled over
    // ord(substr(...)) chars, and the rightmost-tie window minimum via
    // arg_min over the packed key h·2²⁰ + (2²⁰ − p) — min h first, then
    // max p (positions are far below the 2²⁰ radix). Validated
    // row-for-row against an independent reference implementation.
    "l35_winnow_fingerprints" -> {
      val (kk, ww, bb, pp) = (8, 4, 257L, 1000000007L)
      val m = 1L << 20
      val h = (0 until kk).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
        s"(($acc) * $bb + ord(substr(text, p + $j, 1))) % $pp"
      }
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n
         |           FROM documents WHERE length(text) >= $kk),
         |kg AS (
         |  SELECT doc_id, n, p, $h AS h
         |  FROM d, unnest(range(1, n - ${kk - 2})) t(p)),
         |sel AS (
         |  SELECT doc_id, n, p,
         |         arg_min(p, h * $m + ($m - p)) OVER
         |           (PARTITION BY doc_id ORDER BY p
         |            ROWS BETWEEN CURRENT ROW AND ${ww - 1} FOLLOWING) AS pos
         |  FROM kg),
         |fps AS (
         |  SELECT DISTINCT doc_id, pos FROM sel
         |  WHERE p <= n - ${kk - 1} - ${ww - 1})
         |SELECT f.doc_id AS doc_id, f.pos AS pos, kg.h AS fp
         |FROM fps f JOIN kg ON kg.doc_id = f.doc_id AND kg.p = f.pos""".stripMargin
    },
    // One BPE merge-counting round over the word vocabulary: weighted
    // adjacent char-pair counts, top 20 by (count desc, pair asc) — a
    // total order, so the LIMIT is deterministic. Integer-exact.
    "l36_bpe_pair_counts" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS w FROM documents),
         |vocab AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
         |pairs AS (
         |  SELECT substr(w, i::int, 2) AS pair, cnt
         |  FROM vocab, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2)
         |SELECT pair, CAST(sum(cnt) AS BIGINT) AS pair_count
         |FROM pairs GROUP BY pair
         |ORDER BY pair_count DESC, pair ASC LIMIT 20""".stripMargin,
    // Sliding context-window chunking, width 256 / stride 192; md5 over the
    // chunk text makes the content check exact without shipping the text.
    "l37_chunk_stride" ->
      """SELECT doc_id,
        |       (i - 1) // 192 AS chunk_idx,
        |       i AS chunk_start,
        |       CAST(length(substr(text, i::int, 256)) AS BIGINT) AS chunk_len,
        |       md5(substr(text, i::int, 256)) AS chunk_md5
        |FROM documents,
        |     unnest(range(1, greatest(length(text), 1) + 1, 192)) t(i)""".stripMargin,
    // Shannon char entropy in nats. DuckDB sums per-char terms in group
    // order, Spark folds in first-occurrence order — the ulp difference
    // collapses on the shared 9-sig grid (Canon), and the keep flag is
    // derived from the ROUNDED value on both engines.
    "l38_char_entropy" -> {
      val entSql = "sum(-(CAST(cnt AS DOUBLE) / n) * ln(CAST(cnt AS DOUBLE) / n))"
      s"""WITH ch AS (
         |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
         |f AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c),
         |e AS (
         |  SELECT f.doc_id AS doc_id, ${sig6Sql(entSql)} AS char_entropy
         |  FROM f JOIN (SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS n
         |               FROM f GROUP BY doc_id) nn USING (doc_id)
         |  GROUP BY f.doc_id)
         |SELECT doc_id, char_entropy, char_entropy >= 2.8 AS keep FROM e""".stripMargin
    },
    // Cross-document duplicated-span fraction: distinct word-8-grams per
    // doc, doc-frequency >= 2 marks a span as duplicated. The ratio is an
    // exact integer division rounded on the shared grid.
    "l39_dup_span_frac" -> {
      val g8 = (0 until 8).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ws FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, $g8 AS sg
         |  FROM toks, unnest(range(1, len(ws) - 6)) t(i)),
         |c AS (SELECT sg, count(*) AS nd FROM sh GROUP BY sg)
         |SELECT s.doc_id AS doc_id,
         |       count(*) AS n_shingles,
         |       CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |       ${sig6Sql("CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS dup_frac
         |FROM sh s JOIN c USING (sg)
         |GROUP BY s.doc_id""".stripMargin
    },
    // Pairwise source overlap: distinct (source, strHash60(8-gram)) on both
    // engines (the digest, not the string, so the relation is bit-identical
    // to the Spark side), pair counts via self-join, Jaccard on the grid.
    "l41_source_overlap" -> {
      val g8 = (0 until 8).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH toks AS (SELECT source, $toksSql AS ws FROM documents),
         |sh AS (
         |  SELECT DISTINCT source, ${TextOps.strHash60Sql(g8)} AS h
         |  FROM toks, unnest(range(1, len(ws) - 6)) t(i)),
         |cnt AS (SELECT source, count(*) AS ns FROM sh GROUP BY source),
         |inter AS (
         |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, ca.ns AS n_a, cb.ns AS n_b, n_shared,
         |       ${sig6Sql("CAST(n_shared AS DOUBLE) / (ca.ns + cb.ns - n_shared)")} AS jaccard
         |FROM inter JOIN cnt ca ON ca.source = src_a
         |           JOIN cnt cb ON cb.source = src_b""".stripMargin
    },
    // BPE training, three merge rounds statically unrolled via
    // [[bpeOracleCtes]] — see its doc for the greedy-apply closed form and
    // why it avoids list_reduce / empty-separator splits.
    "l42_bpe_train" ->
      s"""WITH ${bpeOracleCtes(3)}
         |SELECT * FROM t1 UNION ALL SELECT * FROM t2
         |UNION ALL SELECT * FROM t3""".stripMargin,
    // BPE encode: the l42 merge rounds (shared CTE chain), then every
    // document's token multiset joins the per-token symbol counts —
    // all-integer arithmetic, so the compare is exact.
    "l45_bpe_encode" ->
      s"""WITH ${bpeOracleCtes(3)},
         |symc AS (SELECT tok, len(ss) AS n_sym FROM v3),
         |dt AS (
         |  SELECT doc_id, tok, count(*) AS k
         |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents) z
         |  GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(k * length(tok)) AS BIGINT) AS n_chars,
         |       CAST(sum(k * n_sym) AS BIGINT) AS n_bpe_tokens
         |FROM dt JOIN symc USING (tok) GROUP BY doc_id""".stripMargin,
    // Vocab coverage: identical (lang, tok, k) base relation, identical
    // total-order vocab cut; all-integer counts, one final rounded ratio.
    "l46_vocab_coverage" ->
      s"""WITH tk AS (
         |  SELECT lang, tok, count(*) AS k
         |  FROM (SELECT lang, unnest($toksSql) AS tok FROM documents) z
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT tok FROM (SELECT tok, sum(k) AS cnt FROM tk GROUP BY tok)
         |  ORDER BY cnt DESC, tok LIMIT 1000)
         |SELECT lang, CAST(sum(k) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN top.tok IS NULL THEN k ELSE 0 END) AS BIGINT)
         |         AS n_oov,
         |       ${sig6Sql("CAST(sum(CASE WHEN top.tok IS NULL THEN k ELSE 0 END) AS DOUBLE) / sum(k)")}
         |         AS oov_rate
         |FROM tk LEFT JOIN top ON tk.tok = top.tok
         |GROUP BY lang""".stripMargin,
    // Fused quality verdict: the four family CTEs are verbatim l16 / l30 /
    // l27 / l38 fragments joined on doc_id; the CASE mirrors the Spark
    // first-failing-family order exactly.
    "l40_quality_fused" -> {
      val entSql = "sum(-(CAST(ccnt AS DOUBLE) / cn) * ln(CAST(ccnt AS DOUBLE) / cn))"
      val verdict =
        """CASE WHEN rule_reason <> 'ok' THEN 'rules:' || rule_reason
          |     WHEN top_tok_frac > 0.15 THEN 'repetition'
          |     WHEN logprob < -1.5 THEN 'lm_score'
          |     WHEN char_entropy < 2.8 THEN 'entropy'
          |     ELSE 'ok' END""".stripMargin
      s"""WITH t AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
         |         CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter($toksSql,
         |           w -> w IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
         |           / greatest(len($toksSql), 1) AS stop_ratio
         |  FROM documents),
         |r AS (
         |  SELECT doc_id,
         |         CASE WHEN chars < 150 THEN 'too_short'
         |              WHEN n_tokens < 20 THEN 'few_tokens'
         |              WHEN stop_ratio > 0.45 THEN 'stopword_heavy'
         |              ELSE 'ok' END AS rule_reason
         |  FROM t),
         |tk AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tc AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY doc_id, tok),
         |rep AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_tok_frac
         |        FROM tc GROUP BY doc_id),
         |freq AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
         |n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM freq),
         |lm AS (
         |  SELECT doc_id, ${sig6Sql("avg(log10(cnt / n.n))")} AS logprob
         |  FROM tk JOIN freq USING (tok), n GROUP BY doc_id),
         |ch AS (SELECT doc_id, unnest(string_split(text, '')) AS cc FROM documents),
         |cf AS (SELECT doc_id, cc, count(*) AS ccnt FROM ch GROUP BY doc_id, cc),
         |e AS (
         |  SELECT cf.doc_id AS doc_id, ${sig6Sql(entSql)} AS char_entropy
         |  FROM cf JOIN (SELECT doc_id, CAST(sum(ccnt) AS DOUBLE) AS cn
         |                FROM cf GROUP BY doc_id) nn USING (doc_id)
         |  GROUP BY cf.doc_id)
         |SELECT r.doc_id AS doc_id, rule_reason, top_tok_frac, logprob,
         |       char_entropy, $verdict AS reason, ($verdict = 'ok') AS keep
         |FROM r LEFT JOIN rep USING (doc_id) LEFT JOIN lm USING (doc_id)
         |       LEFT JOIN e USING (doc_id)""".stripMargin
    },
    // 8-gram overlap between the corpus slice and the benchmark slice;
    // argmax benchmark doc per contaminated corpus doc, ties to smallest id.
    "l26_decontaminate" -> decontOracle,
    // Gopher-style repetition rules: top-unigram fraction (aggregated) and
    // duplicate-bigram fraction (row-local). Integer-ratio doubles —
    // identical IEEE division on both engines, no rounding needed.
    "l30_repetition" ->
      s"""WITH tc AS (
         |  SELECT doc_id, tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents) t
         |  GROUP BY doc_id, tok),
         |top AS (
         |  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_tok_frac
         |  FROM tc GROUP BY doc_id),
         |bg AS (
         |  SELECT doc_id,
         |         1.0 - CAST(len(list_distinct(b)) AS DOUBLE)
         |           / greatest(len(b), 1) AS dup_bigram_frac
         |  FROM (SELECT doc_id,
         |          list_transform(range(1, len(ws)),
         |            i -> ws[i] || ' ' || ws[i+1]) AS b
         |        FROM (SELECT doc_id, $toksSql AS ws FROM documents) w) x)
         |SELECT doc_id, top_tok_frac, dup_bigram_frac
         |FROM top JOIN bg USING (doc_id)""".stripMargin,
    // The bloom pass prunes, the exact join verifies: false positives are
    // eliminated, so the result — and therefore the oracle — is l26's.
    "l31_decontaminate_bloom" -> decontOracle,
    // l03's pair relation fed through the same min-label-closure CTE as the
    // g04 WCC oracle, grouped into clusters.
    "l25_neardup_clusters" ->
      s"""$neardupLabCtes
         |SELECT comp AS cluster, count(*) AS n_docs FROM lab GROUP BY comp""".stripMargin,
    // The SAME label relation APPLIED: survivors are the min-label docs
    // (cluster label = min doc_id by construction) plus every unclustered
    // singleton; the post-dedup corpus rolls up by lang like l19.
    "l44_neardup_dedup" ->
      s"""$neardupLabCtes
         |SELECT d.lang, count(*) AS n_docs,
         |       CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens
         |FROM documents d LEFT JOIN lab ON lab.id = d.doc_id
         |WHERE lab.id IS NULL OR lab.comp = d.doc_id
         |GROUP BY d.lang""".stripMargin,
    // Bigram conditional logprob: both engines aggregate the identical
    // doc-level (w1, w2, k) relation and compute the identical weighted
    // mean Σ k·log10(bcnt/pcnt) / Σ k — same terms, integer weights, one
    // final rounding on the shared sig grid.
    "l43_bigram_logprob" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS ws FROM documents),
         |bg AS (
         |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, count(*) AS k
         |  FROM tk, unnest(range(1, len(ws))) t(i)
         |  GROUP BY 1, 2, 3),
         |bc AS (SELECT w1, w2, sum(k) AS bcnt FROM bg GROUP BY 1, 2),
         |pc AS (SELECT w1, sum(bcnt) AS pcnt FROM bc GROUP BY 1)
         |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
         |       ${sig6Sql("sum(k * log10(bcnt / CAST(pcnt AS DOUBLE))) / sum(k)")} AS logprob
         |FROM bg JOIN bc USING (w1, w2) JOIN pc USING (w1)
         |GROUP BY doc_id""".stripMargin,
    "l19_clean_corpus" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
         |         CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter($toksSql,
         |           w -> w IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
         |           / greatest(len($toksSql), 1) AS stop_ratio
         |  FROM documents),
         |kept AS (
         |  SELECT doc_id, n_tokens FROM t
         |  WHERE chars >= 150 AND n_tokens >= 20 AND stop_ratio <= 0.45),
         |dedup AS (
         |  SELECT d.doc_id, d.lang, kept.n_tokens,
         |         row_number() OVER (PARTITION BY md5(d.text)
         |                            ORDER BY d.doc_id) AS rn
         |  FROM documents d JOIN kept ON kept.doc_id = d.doc_id)
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM dedup WHERE rn = 1 GROUP BY lang""".stripMargin,
  )
}
