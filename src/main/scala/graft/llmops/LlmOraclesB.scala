package graft.llmops

import graft.Canon.sig6Sql

import LlmOracleHelpers._

/** Second half of the LLM-pipeline oracle registry (file-size split;
  * [[LlmQueries]] aggregates — semantics and keys unchanged). Shared
  * CTE builders live in [[LlmOracleHelpers]].
  */
object LlmOraclesB {

  val oracles: Map[String, String] = Map(
    // Zipf fit: deterministic top-100 ranks (count desc, token asc), each
    // ln() term grid-rounded before the sums (l58's device), slope and
    // intercept from the identical closed forms over the sums.
    "l65_zipf_fit" ->
      s"""WITH t AS (SELECT unnest($toksSql) AS tok FROM documents),
         |f AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
         |top AS (SELECT cnt,
         |          row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank
         |        FROM f ORDER BY cnt DESC, tok ASC LIMIT 100),
         |xy AS (SELECT ${sig6Sql("ln(CAST(rank AS DOUBLE))")} AS x,
         |              ${sig6Sql("ln(CAST(cnt AS DOUBLE))")} AS y
         |       FROM top),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
         |             sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
         |      FROM xy)
         |SELECT n AS n_points,
         |       ${sig6Sql("(n*sxy - sx*sy) / (n*sxx - sx*sx)")} AS slope,
         |       ${sig6Sql("(sy*sxx - sx*sxy) / (n*sxx - sx*sx)")}
         |         AS intercept
         |FROM s""".stripMargin,
    // Dedup audit: ONE minhash CTE chain serves both sides — the exact
    // pairs from the shingle-hash relation (jaccardPairs hashes shingles
    // with the same strHash60, so the Jaccard values agree) and the l04
    // candidate+verify pipeline from the band keys; counts + recall.
    "l70_dedup_audit" ->
      s"""$minhashCtes,
         |exi AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ex AS (SELECT da, db FROM exi
         |       JOIN n na ON na.doc_id = exi.da
         |       JOIN n nb ON nb.doc_id = exi.db
         |       WHERE CAST(inter AS DOUBLE)/(na.n + nb.n - inter) >= 0.5),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.bkey = b.bkey
         |    AND a.doc_id < b.doc_id),
         |ixf AS (
         |  SELECT c.da, c.db, count(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.da
         |  JOIN sh b ON b.doc_id = c.db AND b.h = a.h
         |  GROUP BY 1, 2),
         |fd AS (SELECT da, db FROM ixf
         |       JOIN n na ON na.doc_id = ixf.da
         |       JOIN n nb ON nb.doc_id = ixf.db
         |       WHERE CAST(inter AS DOUBLE)/(na.n + nb.n - inter) >= 0.5),
         |tp AS (SELECT CAST(count(*) AS BIGINT) AS tp FROM
         |       (SELECT da, db FROM ex INTERSECT SELECT da, db FROM fd) q),
         |c AS (SELECT
         |        CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
         |        CAST((SELECT count(*) FROM fd) AS BIGINT) AS n_found,
         |        (SELECT tp FROM tp) AS n_true_pos)
         |SELECT n_exact, n_found, n_true_pos,
         |       n_exact - n_true_pos AS n_missed,
         |       n_found - n_true_pos AS n_spurious,
         |       CASE WHEN n_exact > 0 THEN ${sig6Sql(
             "CAST(n_true_pos AS DOUBLE) / n_exact")}
         |            ELSE 0.0 END AS recall
         |FROM c""".stripMargin,
    // Corpus card: one aggregation over per-doc digests/token counts;
    // integer counts BIGINT-cast, the two rates on the sig6 grid.
    "l69_corpus_card" ->
      s"""WITH d AS (
         |  SELECT lang, source, md5(text) AS digest,
         |         len($toksSql) AS nt
         |  FROM documents)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(nt) AS BIGINT) AS n_tokens,
         |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |       CAST(count(DISTINCT digest) AS BIGINT) AS n_unique_docs,
         |       ${sig6Sql("1.0 - CAST(count(DISTINCT digest) AS DOUBLE)" +
             " / count(*)")} AS exact_dup_frac,
         |       ${sig6Sql("CAST(sum(nt) AS DOUBLE) / count(*)")}
         |         AS mean_tokens
         |FROM d""".stripMargin,
    // Outliers: the l14 Lloyd chain's final assignment JOINED with its
    // final centroids; full squared distance (|v|² + |c|² − 2v·c), mean /
    // population-stddev per cluster, z — every float on the sig6 grid.
    "l68_embed_outliers" -> {
      val (chain, fin, cen) = graft.algos.KMeans.lloydCtesOver(
        "pts", "", k = 8, iters = 5, dim = 64)
      s"""WITH pts AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |$chain,
         |d AS (
         |  SELECT a.cluster, a.vec_id,
         |         ${sig6Sql("list_inner_product(a.v, a.v) " +
             "+ list_inner_product(c.c, c.c) " +
             "- 2*list_inner_product(a.v, c.c)")} AS d2
         |  FROM $fin a JOIN $cen c ON c.cluster = a.cluster),
         |st AS (
         |  SELECT cluster, ${sig6Sql("avg(d2)")} AS m,
         |         ${sig6Sql(
             "sqrt(greatest(0, avg(d2*d2) - avg(d2)*avg(d2)))")} AS sd
         |  FROM d GROUP BY cluster)
         |SELECT d.cluster, d.vec_id, d.d2,
         |       ${sig6Sql("(d.d2 - st.m) / st.sd")} AS z
         |FROM d JOIN st USING (cluster)
         |WHERE st.sd > 0
         |  AND ${sig6Sql("(d.d2 - st.m) / st.sd")} > 2.0""".stripMargin
    },
    // Cluster-quota sampling: the l14 Lloyd chain's final assignment, a
    // per-cluster md5-ordered row_number, quota cut at 10.
    "l66_cluster_sample" -> {
      val (ctes, fin) = graft.algos.KMeans.lloydAssignCtes(k = 8, iters = 5,
        dim = 64)
      s"""WITH $ctes,
         |rk AS (
         |  SELECT cluster, vec_id,
         |         row_number() OVER (PARTITION BY cluster
         |           ORDER BY md5('cqs:' || CAST(vec_id AS VARCHAR)) ASC,
         |                    vec_id ASC) AS rk
         |  FROM $fin)
         |SELECT cluster, vec_id, CAST(rk AS BIGINT) AS rk
         |FROM rk WHERE rk <= 10""".stripMargin
    },
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
    // Banding inlined per the ADAPTIVE config: l08 runs the registry
    // default (threshold 0.45), so the oracle bands with bandBitsFor(0.45)
    // — a banding-rule change moves both sides together.
    "l08_embed_dup_lsh" -> srpLshOracle(bandBits = Similarity.bandBitsFor(0.45)),
    "l62_embed_dup_lsh_mp" ->
      srpLshMpOracle(bandBits = Similarity.bandBitsFor(0.45)),
    // Same plane literals and signature CTEs at the FIXED 8×6 point — the
    // regression pin for the operating point the adaptive default selects
    // at threshold 0.45 (bandBitsFor(0.45) == 6, so l08 and l51 currently
    // coincide; a banding-rule drift separates them loudly).
    "l51_embed_dup_lsh_mid" -> srpLshOracle(bandBits = 6),
    // MMR re-ranking, statically unrolled: the same top-poolK pool cut,
    // then per stage the argmax of λ·rel − μ·max-sim-to-selected with the
    // identical sig6 grid and (mmr DESC, vec_id ASC) tie order. λ/μ/pool/k
    // interpolate from the Similarity constants — one knob, two engines.
    "l64_mmr_rerank" -> {
      val lam = Similarity.MmrLambda
      val mu = Similarity.MmrMu
      val poolK = Similarity.MmrPoolK
      val k = Similarity.MmrK
      def stage(r: Int): String = {
        val pick =
          s"""c$r AS (SELECT p.vec_id, p.rel,
             |    max(${sig6Sql("list_cosine_similarity(p.v, s.v)")}) AS ms
             |  FROM pool p, sel$r s
             |  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel$r)
             |  GROUP BY p.vec_id, p.rel),
             |s$r AS MATERIALIZED (SELECT c.vec_id, p.v,
             |    ${sig6Sql(s"$lam * c.rel - $mu * c.ms")} AS mmr
             |  FROM c$r c JOIN pool p ON p.vec_id = c.vec_id
             |  ORDER BY mmr DESC, c.vec_id ASC LIMIT 1)""".stripMargin
        if (r == k - 1) pick
        else
          s"""$pick,
             |sel${r + 1} AS (SELECT vec_id, v FROM sel$r
             |  UNION ALL SELECT vec_id, v FROM s$r)""".stripMargin
      }
      val picks = (1 until k).map(r =>
        s"SELECT CAST($r AS INTEGER) AS round, vec_id, mmr FROM s$r")
      s"""WITH e AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |q AS (SELECT v FROM e WHERE vec_id = 0),
         |pool AS MATERIALIZED (
         |  SELECT e.vec_id, e.v,
         |         ${sig6Sql("list_cosine_similarity(e.v, q.v)")} AS rel
         |  FROM e, q WHERE e.vec_id <> 0
         |  ORDER BY rel DESC, vec_id ASC LIMIT $poolK),
         |s0 AS MATERIALIZED (
         |  SELECT vec_id, v, ${sig6Sql(s"$lam * rel")} AS mmr
         |  FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1),
         |sel1 AS (SELECT vec_id, v FROM s0),
         |${(1 until k).map(stage).mkString(",\n")}
         |SELECT CAST(0 AS INTEGER) AS round, vec_id, mmr FROM s0
         |UNION ALL
         |${picks.mkString("\nUNION ALL\n")}""".stripMargin
    },
    // Greedy k-center sampling, 6 picks statically unrolled: the seed is
    // the smallest vec_id; each stage takes the point with the maximum
    // sig6-rounded min-cosine-distance to the selected set (ties to the
    // smallest id) and folds the new center into the running minimum via
    // LEAST — the exact incremental update the Spark loop runs. Every
    // stage MATERIALIZED (the g34 inline-blowup lesson).
    "l63_kcenter_sample" -> {
      val k = Similarity.KcenterK // unroll depth = the Spark side's k
      def stage(r: Int): String = {
        val pick =
          s"""s$r AS MATERIALIZED (
             |  SELECT vec_id, v, d FROM p$r
             |  ORDER BY d DESC, vec_id ASC LIMIT 1)""".stripMargin
        if (r == k - 1) pick // the last pick needs no further pool update
        else
          s"""$pick,
             |p${r + 1} AS MATERIALIZED (
             |  SELECT p.vec_id, p.v,
             |         LEAST(p.d, ${graft.Canon.sig6Sql(
                    "1.0 - list_cosine_similarity(p.v, s.v)")}) AS d
             |  FROM p$r p, s$r s WHERE p.vec_id <> s.vec_id)""".stripMargin
      }
      val picks = (1 until k).map(r =>
        s"SELECT CAST($r AS INTEGER) AS round, vec_id, d AS dist FROM s$r")
      s"""WITH e AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |s0 AS MATERIALIZED (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
         |p1 AS MATERIALIZED (
         |  SELECT e.vec_id, e.v,
         |         ${graft.Canon.sig6Sql(
                "1.0 - list_cosine_similarity(e.v, s0.v)")} AS d
         |  FROM e, s0 WHERE e.vec_id <> s0.vec_id),
         |${(1 until k).map(stage).mkString(",\n")}
         |SELECT CAST(0 AS INTEGER) AS round, vec_id, 0.0 AS dist FROM s0
         |UNION ALL
         |${picks.mkString("\nUNION ALL\n")}""".stripMargin
    },
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
      // Char extraction via substr over a range, NOT string_split(text, '')
      // — empty-separator split semantics have drifted across DuckDB
      // releases (the round-6 l42 hardening class; the driver runs a newer
      // DuckDB than the local mirror), while substr/length are stable.
      // Verified identical on both SFs' corpora.
      s"""WITH ch AS (
         |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
         |  FROM documents, unnest(range(1, length(text) + 1)) t(i)),
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
    // Fertility: the l45 merge replay grouped by language — all-integer
    // sums, two final rounded ratios.
    "l67_bpe_fertility" ->
      s"""WITH ${bpeOracleCtes(3)},
         |symc AS (SELECT tok, len(ss) AS n_sym FROM v3),
         |lt AS (
         |  SELECT lang, tok, count(*) AS k
         |  FROM (SELECT lang, unnest($toksSql) AS tok FROM documents) z
         |  GROUP BY 1, 2)
         |SELECT lang, CAST(sum(k) AS BIGINT) AS n_words,
         |       CAST(sum(k * n_sym) AS BIGINT) AS n_bpe_tokens,
         |       ${sig6Sql("CAST(sum(k * n_sym) AS DOUBLE) / sum(k)")}
         |         AS fertility,
         |       ${sig6Sql(
             "CAST(sum(k * length(tok)) AS DOUBLE) / sum(k * n_sym)")}
         |         AS chars_per_token
         |FROM lt JOIN symc USING (tok) GROUP BY lang""".stripMargin,
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
         |ch AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS cc
         |       FROM documents, unnest(range(1, length(text) + 1)) t(i)),
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
    // The END-TO-END funnel composed from the component oracles: the
    // neardup label closure (l25/l44's CTEs), l40's fused-quality chain
    // (verdict folded to a keep set), l26's 8-gram contamination flags
    // (renamed s8/flag — the 4-gram `sh` of the neardup chain coexists),
    // an md5-survivor set, and cumulative-mask stage aggregates. `m` is
    // MATERIALIZED: it is referenced once per stage row, and un-hinted
    // DuckDB would inline the entire upstream (pair join + quality chain +
    // 8-gram self-join) five times — the g28 lesson.
    "l57_curation_funnel" -> {
      val entSql = "sum(-(CAST(ccnt AS DOUBLE) / cn) * ln(CAST(ccnt AS DOUBLE) / cn))"
      val verdict =
        """CASE WHEN rule_reason <> 'ok' THEN 'rules:' || rule_reason
          |     WHEN top_tok_frac > 0.15 THEN 'repetition'
          |     WHEN logprob < -1.5 THEN 'lm_score'
          |     WHEN char_entropy < 2.8 THEN 'entropy'
          |     ELSE 'ok' END""".stripMargin
      def stageRow(ord: Int, name: String, cond: String): String =
        s"""SELECT CAST($ord AS BIGINT) AS stage_ord, '$name' AS stage,
           |       CAST(count(*) FILTER (WHERE $cond) AS BIGINT) AS n_docs,
           |       CAST(coalesce(sum(n_tokens) FILTER (WHERE $cond), 0) AS BIGINT) AS n_tokens
           |FROM m""".stripMargin
      s"""$neardupLabCtes,
         |t AS (
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
         |ch AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS cc
         |       FROM documents, unnest(range(1, length(text) + 1)) t(i)),
         |cf AS (SELECT doc_id, cc, count(*) AS ccnt FROM ch GROUP BY doc_id, cc),
         |e AS (
         |  SELECT cf.doc_id AS doc_id, ${sig6Sql(entSql)} AS char_entropy
         |  FROM cf JOIN (SELECT doc_id, CAST(sum(ccnt) AS DOUBLE) AS cn
         |                FROM cf GROUP BY doc_id) nn USING (doc_id)
         |  GROUP BY cf.doc_id),
         |fq AS (
         |  SELECT r.doc_id AS doc_id
         |  FROM r LEFT JOIN rep USING (doc_id) LEFT JOIN lm USING (doc_id)
         |         LEFT JOIN e USING (doc_id)
         |  WHERE ($verdict) = 'ok'),
         |ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |s8 AS (
         |  SELECT DISTINCT doc_id,
         |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
         |           || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6]
         |           || ' ' || ws[i+7] AS s
         |  FROM toks, unnest(range(1, len(ws) - 6)) t(i)),
         |flag AS (
         |  SELECT DISTINCT c.doc_id
         |  FROM s8 c JOIN s8 b ON c.s = b.s
         |  WHERE c.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
         |  GROUP BY c.doc_id, b.doc_id
         |  HAVING count(*) >= 2),
         |m AS MATERIALIZED (
         |  SELECT t.doc_id, t.n_tokens,
         |         t.doc_id IN (SELECT doc_id FROM ex) AS k1,
         |         t.doc_id IN (SELECT doc_id FROM fq) AS kq,
         |         t.doc_id IN (SELECT id FROM lab WHERE id <> comp) AS nd,
         |         t.doc_id IN (SELECT doc_id FROM flag) AS ct
         |  FROM t)
         |${stageRow(0, "input", "TRUE")}
         |UNION ALL ${stageRow(1, "exact_dedup", "k1")}
         |UNION ALL ${stageRow(2, "quality", "k1 AND kq")}
         |UNION ALL ${stageRow(3, "near_dedup", "k1 AND kq AND NOT nd")}
         |UNION ALL ${stageRow(4, "decontaminated",
           "k1 AND kq AND NOT nd AND NOT ct")}""".stripMargin
    },
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
    // Cross-doc span scrub: positioned 8-gram digests, doc-frequency >= 2
    // over distinct (doc, digest) marks duplicated grams, their covered
    // positions union per doc, survivors reassemble position-ordered.
    // Mirrors Dedup.spanScrub value-for-value (same md5 digests, same
    // 1-based positions).
    "l52_span_scrub" -> {
      val g8 = (0 until 8).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ws FROM documents),
         |pos AS (SELECT doc_id, i, ${TextOps.strHash60Sql(s"($g8)")} AS h
         |        FROM toks, unnest(range(1, len(ws) - 6)) t(i)),
         |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM pos) d
         |        GROUP BY h HAVING count(*) >= 2),
         |cov AS (SELECT DISTINCT q.doc_id, q.i + j AS p
         |        FROM pos q JOIN dup USING (h), unnest(range(0, 8)) u(j)),
         |covn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nc
         |         FROM cov GROUP BY doc_id),
         |tokpos AS (SELECT doc_id, p, ws[p] AS tok
         |           FROM toks, unnest(range(1, len(ws) + 1)) t(p)),
         |kept AS (SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.p) AS sc
         |         FROM tokpos t
         |         LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.p = t.p
         |         WHERE cov.p IS NULL GROUP BY t.doc_id)
         |SELECT toks.doc_id AS doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
         |       coalesce(covn.nc, 0) AS n_removed,
         |       coalesce(kept.sc, '') AS scrubbed
         |FROM toks LEFT JOIN covn ON covn.doc_id = toks.doc_id
         |          LEFT JOIN kept ON kept.doc_id = toks.doc_id""".stripMargin
    },
    // Overlap-fraction decontamination: distinct 4-gram digests per corpus
    // doc, share matched against the benchmark slice's digest set, flag at
    // the grid-rounded 0.1 threshold (same smoothing-free ratio as the
    // Spark side).
    "l53_decontaminate_overlap" -> {
      val g4 = (0 until 4).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ws FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${TextOps.strHash60Sql(s"($g4)")} AS h
         |       FROM toks, unnest(range(1, len(ws) - 2)) t(i)),
         |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 10 = 0),
         |corp AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
         |        FROM corp GROUP BY doc_id),
         |shr AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |        FROM corp c JOIN bench b USING (h) GROUP BY c.doc_id)
         |SELECT doc_id, n_shingles, n_shared,
         |       ${sig6Sql("CAST(n_shared AS DOUBLE) / n_shingles")} AS contam_frac,
         |       ${sig6Sql("CAST(n_shared AS DOUBLE) / n_shingles")} >= 0.1 AS flagged
         |FROM shr JOIN tot USING (doc_id)""".stripMargin
    },
    // DSIR hashed-unigram importance weights: the same 4096-bucket fold of
    // the md5 token digest, Laplace-smoothed target(en)/raw bucket models,
    // per-bucket log10 ratios on the grid, per-doc mean re-rounded.
    "l54_dsir_weights" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, ${TextOps.strHash60Sql("tok")} % 4096 AS b
         |  FROM (SELECT doc_id, lang, unnest($toksSql) AS tok FROM documents)),
         |raw AS (SELECT b, count(*) AS cr FROM toks GROUP BY b),
         |tgt AS (SELECT b, count(*) AS ct FROM toks WHERE lang = 'en' GROUP BY b),
         |tots AS (SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM raw) AS nr,
         |                (SELECT CAST(sum(ct) AS DOUBLE) FROM tgt) AS nt),
         |lr AS (SELECT raw.b,
         |  ${sig6Sql("log10((coalesce(ct, 0) + 1.0) / (nt + 4096)) - log10((cr + 1.0) / (nr + 4096))")} AS lr
         |  FROM raw LEFT JOIN tgt ON tgt.b = raw.b, tots)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       ${sig6Sql("avg(lr)")} AS dsir_w
         |FROM toks JOIN lr USING (b) GROUP BY doc_id""".stripMargin,
    // Product quantization reproduced exactly: one statically-unrolled
    // Lloyd chain PER SUBSPACE (shared lloydCtesOver generator — prefixed
    // CTE names so four chains coexist), then the same broadcast-shaped
    // ADC: per-(query, subspace, codeword) squared distances on the grid,
    // summed per (query, vector) over the vector's codes, re-rounded,
    // (adc, vec_id)-ranked.
    "l55_pq_topk" -> {
      // Constants come from the SAME vals that default pqTopK's parameters
      // (Similarity.Pq*) — the oracle pins the registry defaults, and a
      // default drift moves both sides together instead of silently
      // diverging them.
      val (ss, sd, kC, it) = (Similarity.PqSubspaces, Similarity.PqSubDim,
        Similarity.PqCodes, Similarity.PqIters)
      val ip = "list_inner_product"
      val sub = (0 until ss).map { sp =>
        val rel = s"pts$sp"
        val (chain, fin, cen) =
          graft.algos.KMeans.lloydCtesOver(rel, s"s$sp", kC, it, sd)
        val slice =
          s"""$rel AS MATERIALIZED (
             |  SELECT vec_id, list_slice(v, ${sp * sd + 1}, ${(sp + 1) * sd}) AS v
             |  FROM pts)""".stripMargin
        (sp, slice, chain, fin, cen)
      }
      val dts = sub.map { case (sp, _, _, _, cen) =>
        val qs = s"list_slice(q.v, ${sp * sd + 1}, ${(sp + 1) * sd})"
        s"""SELECT q.vec_id AS query_id, $sp AS sp, c.cluster,
           |  ${sig6Sql(s"$ip(c.c, c.c) - 2*$ip($qs, c.c) + $ip($qs, $qs)")} AS d2
           |FROM q, $cen c""".stripMargin
      }.mkString("\nUNION ALL ")
      val codes = sub.map { case (sp, _, _, fin, _) =>
        s"SELECT vec_id, $sp AS sp, cluster FROM $fin"
      }.mkString("\nUNION ALL ")
      s"""WITH pts AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |${sub.map(t => t._2 + ",\n" + t._3).mkString(",\n")},
         |q AS (SELECT vec_id, v FROM pts WHERE vec_id < ${Similarity.PqQueries}),
         |dt AS MATERIALIZED (
         |$dts),
         |codes AS (
         |$codes),
         |adc AS (
         |  SELECT dt.query_id, codes.vec_id, ${sig6Sql("sum(dt.d2)")} AS adc
         |  FROM codes JOIN dt USING (sp, cluster)
         |  WHERE codes.vec_id <> dt.query_id
         |  GROUP BY dt.query_id, codes.vec_id)
         |SELECT query_id, vec_id, adc FROM (
         |  SELECT query_id, vec_id, adc,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY adc, vec_id) AS rn
         |  FROM adc) t
         |WHERE rn <= ${Similarity.PqK}""".stripMargin
    },
    // Power iteration statically unrolled (Similarity.PcaIters rounds, the
    // SAME val that defaults pcaPowerProject): every stage — μ, the
    // centering scalar c, per-row scores s, accumulated a_i / b, the
    // recombined w_i, the normalized v_i — lands on the shared grid
    // exactly like the Spark side (the g28 chained-stage discipline), so
    // the unrolled iterations hold bit-identical doubles throughout.
    "l58_pca_project" -> {
      def iter(t: Int, prev: String) =
        s"""c$t AS (SELECT ${sig6Sql("sum(m * x)")} AS c
           |  FROM mu JOIN $prev USING (i)),
           |s$t AS MATERIALIZED (SELECT b.vec_id,
           |  ${sig6Sql("sum(b.e * v.x) - (SELECT c FROM c" + t + ")")} AS sc
           |  FROM base b JOIN $prev v USING (i) GROUP BY b.vec_id),
           |a$t AS (SELECT b.i, ${sig6Sql("sum(s.sc * b.e)")} AS a
           |  FROM base b JOIN s$t s USING (vec_id) GROUP BY b.i),
           |b$t AS (SELECT ${sig6Sql("sum(sc)")} AS bb FROM s$t),
           |w$t AS MATERIALIZED (SELECT a.i,
           |  ${sig6Sql("a.a - (SELECT bb FROM b" + t + ") * mu.m")} AS w
           |  FROM a$t a JOIN mu USING (i)),
           |nrm$t AS (SELECT sqrt(sum(w * w)) AS nrm FROM w$t),
           |v$t AS MATERIALIZED (SELECT i,
           |  ${sig6Sql("w / (SELECT nrm FROM nrm" + t + ")")} AS x
           |  FROM w$t)""".stripMargin
      val n = Similarity.PcaIters
      val iters = (1 to n)
        .map(t => iter(t, if (t == 1) "v0" else s"v${t - 1}"))
        .mkString(",\n")
      s"""WITH base AS MATERIALIZED (
         |  SELECT vec_id, i, embedding[i]::DOUBLE AS e
         |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
         |mu AS MATERIALIZED (SELECT i,
         |  ${sig6Sql(
            "sum(e) / (SELECT CAST(count(*) AS DOUBLE) FROM embeddings)")} AS m
         |  FROM base GROUP BY i),
         |v0 AS (SELECT i, 1.0 AS x FROM mu),
         |$iters,
         |cf AS (SELECT ${sig6Sql("sum(m * x)")} AS c FROM mu JOIN v$n USING (i))
         |SELECT b.vec_id,
         |  ${sig6Sql("sum(b.e * v.x) - (SELECT c FROM cf)")} AS score
         |FROM base b JOIN v$n v USING (i) GROUP BY b.vec_id""".stripMargin
    },
  )
}
