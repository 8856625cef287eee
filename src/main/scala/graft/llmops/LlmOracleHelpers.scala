package graft.llmops

import graft.Canon.sig6Sql

/** Shared SQL/CTE builders of the split oracle registry ([[LlmOraclesA]] /
  * [[LlmOraclesB]]) — the md5 tokenizer text, the unrolled MinHash/Lloyd/BPE
  * CTE generators, and the SRP-LSH oracle template.
  */
object LlmOracleHelpers {

  // private[graft]: the m10 pair-manifest oracle (multimodal package)
  // composes the l16 quality CTE and needs the same tokenizer text.
  private[graft] val toksSql =
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
  /** MinHash CTE chain with `rows`-wide bands — parameterized exactly like
    * the Spark side's explodeBands so the adaptive-banding variants (l56)
    * inline their own operating point.
    */
  private[llmops] def minhashCtesWith(rows: Int): String = {
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
       |  SELECT doc_id, pid // $rows AS band_id, list(mh ORDER BY pid) AS bkey
       |  FROM sig GROUP BY doc_id, pid // $rows)""".stripMargin
  }

  private[llmops] lazy val minhashCtes: String = minhashCtesWith(4)

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
  private[llmops] def bpeOracleCtes(rounds: Int): String = {
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
  private[llmops] val langIdOracle: String =
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
  private[llmops] val neardupLabCtes: String =
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
  private[llmops] val decontOracle: String =
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
  /** The 48 hyperplanes as DuckDB VALUES rows — shared by the l08/l51
    * single-probe and l62 multi-probe oracles.
    */
  private lazy val planeRowsSql: String =
    Similarity.planes.zipWithIndex.map { case (pl, p) =>
      val vals = pl.map(x =>
        String.format(java.util.Locale.ROOT, "%.17e", Double.box(x)))
      s"($p, [${vals.mkString(", ")}])"
    }.mkString(",\n")

  /** l62's multi-probe mirror: the same projection CTE yields both the
    * sign bits AND each band's minimum-|margin| plane (row_number over
    * (vec, band) by abs(dot), ties to the lowest p — exactly the native
    * expression's strict-< argmin), so the probe keys reproduce exactly;
    * candidates join probe-side {sign key, flipped key} against base-side
    * sign keys, orientation-free.
    */
  private[llmops] def srpLshMpOracle(bandBits: Int): String = {
    val bands = Similarity.Planes / bandBits
    val mask = (1L << bandBits) - 1
    s"""WITH pl(p, pv) AS (VALUES
       |$planeRowsSql),
       |e AS (SELECT vec_id,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM embeddings),
       |dots AS (
       |  SELECT vec_id, p, list_inner_product(e.v, pl.pv) AS dot
       |  FROM e, pl),
       |sg AS (
       |  SELECT vec_id,
       |         CAST(sum(CASE WHEN dot >= 0
       |                       THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
       |              AS BIGINT) AS sig
       |  FROM dots GROUP BY vec_id),
       |flip AS (
       |  SELECT vec_id, CAST(p // $bandBits AS INT) AS band_id, p AS fp
       |  FROM (SELECT vec_id, p,
       |               row_number() OVER (
       |                 PARTITION BY vec_id, p // $bandBits
       |                 ORDER BY abs(dot), p) AS rn
       |        FROM dots) t WHERE rn = 1),
       |bands AS (
       |  SELECT vec_id, CAST(b AS INT) AS band_id,
       |         (sig >> ($bandBits * CAST(b AS INT))) & $mask AS band_key
       |  FROM sg, unnest(range($bands)) t(b)),
       |probes AS (
       |  SELECT vec_id, band_id, band_key FROM bands
       |  UNION
       |  SELECT b.vec_id, b.band_id,
       |         xor(b.band_key, CAST(1 AS BIGINT) << (f.fp % $bandBits))
       |  FROM bands b JOIN flip f
       |    ON f.vec_id = b.vec_id AND f.band_id = b.band_id),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM probes a JOIN bands b
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

  private[llmops] def srpLshOracle(bandBits: Int): String = {
    val bands = Similarity.Planes / bandBits
    val mask = (1L << bandBits) - 1
    val planeRows = planeRowsSql
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
}
