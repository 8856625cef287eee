package graft.llmops

import graft.Canon.sig6Sql

import LlmOracleHelpers._

/** First half of the LLM-pipeline oracle registry (file-size split;
  * [[LlmQueries]] aggregates — semantics and keys unchanged). Shared
  * CTE builders live in [[LlmOracleHelpers]].
  */
object LlmOraclesA {

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
    // The ADAPTIVE-banding high-threshold point: identical pipeline with
    // 4×8 bands inlined (minhashCtesWith(8) — the width rowsFor(0.85)
    // derives) and the 0.85 Jaccard cut. Same engine-agnostic integer
    // arithmetic, so DuckDB reproduces the stricter candidate set and its
    // verified survivors verbatim.
    "l56_minhash_pairs_hi" ->
      s"""${minhashCtesWith(8)},
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
         |WHERE CAST(inter AS DOUBLE)/(na.n + nb.n - inter) >= 0.85""".stripMargin,
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
    "l61_weighted_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |         CAST(len(list_filter($toksSql,
         |           w -> w IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
         |           / greatest(len($toksSql), 1) AS stop_ratio,
         |         CAST(concat('0x', substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS u
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, lang, u,
         |         ${graft.Canon.sig6Sql("0.1 + 0.9 * least(stop_ratio / 0.45, 1.0)")} AS accept_p
         |  FROM t)
         |SELECT doc_id, lang, accept_p FROM p
         |WHERE CAST(u AS DOUBLE) < accept_p * 1000000.0""".stripMargin,
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
    // CCNet bucketing = l27's score chain + a per-language ranked window +
    // integer bucket arithmetic ((rank−1)·3 // n) — the rank orders the
    // grid-rounded score with doc_id tie-break, so bucket membership is
    // engine-exact.
    "l60_ppl_buckets" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |freq AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
         |n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM freq),
         |lp AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |         ${sig6Sql("avg(log10(cnt / n.n))")} AS logprob
         |  FROM tk JOIN freq USING (tok), n
         |  GROUP BY doc_id),
         |r AS (
         |  SELECT d.lang, lp.n_tokens, lp.logprob,
         |         row_number() OVER (PARTITION BY d.lang
         |           ORDER BY lp.logprob DESC, lp.doc_id) AS rank,
         |         count(*) OVER (PARTITION BY d.lang) AS nl
         |  FROM lp JOIN documents d USING (doc_id))
         |SELECT lang, CAST(((rank - 1) * 3) // nl AS BIGINT) AS bucket,
         |       count(*) AS n_docs,
         |       ${sig6Sql("avg(logprob)")} AS avg_logprob,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM r GROUP BY lang, bucket""".stripMargin,
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
    // Hard-negative mining = l32's BM25 chain + l03's Jaccard-pair chain +
    // an anti-join: positive = BM25 top-1, its ≥0.5-Jaccard near-dups are
    // excluded as false negatives, the next k docs rank as negatives.
    // Scores are grid-rounded before every rank/cut (doc_id tie-break), so
    // both engines cut identical boundaries.
    "l59_hard_negatives" ->
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
         |scores AS MATERIALIZED (SELECT doc_id, ${sig6Sql("raw")} AS score FROM sc),
         |top1 AS (SELECT doc_id AS pos_id FROM scores
         |         ORDER BY score DESC, doc_id LIMIT 1),
         |toks AS (
         |  SELECT doc_id, $toksSql AS ws FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
         |  FROM toks, unnest(range(1, len(ws) - 2)) t(i)
         |), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |jpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jp AS (SELECT doc_a, doc_b FROM jpairs
         |  JOIN cnt ca ON ca.doc_id = doc_a
         |  JOIN cnt cb ON cb.doc_id = doc_b
         |  WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5),
         |dups AS (SELECT doc_b AS doc_id FROM jp JOIN top1 ON doc_a = pos_id
         |  UNION SELECT doc_a FROM jp JOIN top1 ON doc_b = pos_id
         |  UNION SELECT pos_id FROM top1),
         |negs AS (SELECT doc_id, score FROM scores
         |  WHERE doc_id NOT IN (SELECT doc_id FROM dups))
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         |         AS neg_rank, doc_id, score
         |FROM negs ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
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
  )
}
