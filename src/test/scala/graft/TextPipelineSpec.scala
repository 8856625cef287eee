package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.{Curation, Dedup, TextStats}

/** Hand-computable fixtures for the l36–l39 text-pipeline operators: BPE
  * pair counting, stride chunking, char entropy, and duplicated-span
  * fraction. The DuckDB hash gate checks these on the real corpus; the
  * fixtures here pin the SEMANTICS (exact expected values on inputs small
  * enough to verify by hand).
  */
class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Writes a documents.parquet fixture and returns its directory. */
  private def docsFixture(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_text_fx")
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bpe pair counts: vocabulary-weighted adjacent pairs, ordered cut") {
    // vocab: aa×2, bb×1, abc×2 → pairs aa:2, bb:1, ab:2, bc:2.
    val dir = docsFixture(Seq(1L -> "aa bb aa", 2L -> "abc abc"))
    val got = TextStats.bpePairCounts(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("aa" -> 2L, "ab" -> 2L, "bc" -> 2L, "bb" -> 1L))
  }

  test("bpe pair counts conserve the vocabulary-weighted pair total") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // Independent recomputation: Σ_word (len-1)·count over words of len≥2
    // must equal Σ pair_count over ALL pairs (so run with k large enough
    // to keep every pair).
    val full = TextStats.bpePairCounts(spark, sf, k = 1 << 20)
      .agg(sum($"pair_count")).head().getLong(0)
    val expected = Tables.load(spark, sf, "documents")
      .select(explode(llmops.TextOps.tokens($"text")).as("w"))
      .filter(length($"w") >= 2)
      .agg(sum(length($"w") - 1)).head().getLong(0)
    assert(full == expected)
  }

  test("bpe train: weighted pick, chained merges, greedy overlap apply") {
    // vocab: "ababab"×2, "ab"×1.
    //  r1 pairs: (a,b) 3·2+1 = 7, (b,a) 2·2 = 4 → merge (a,b)→"ab" @7.
    //    "a b a b a b" is the overlapping chain: the greedy fold merges
    //    occurrences 1, 2 and 3 left to right → "ab ab ab".
    //  r2: (ab,ab) 2·2 = 4 → "abab";  r3: (abab,ab) 1·2 = 2 → "ababab".
    val dir = docsFixture(Seq(1L -> "ababab ababab", 2L -> "ab"))
    val got = TextStats.bpeTrain(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, "a", "b", "ab", 7L),
      (2, "ab", "ab", "abab", 4L),
      (3, "abab", "ab", "ababab", 2L)))
  }

  test("bpe train: round-1-exhausted vocabulary yields an empty merge table") {
    // Every token is a single character: no adjacent pair exists, so the
    // loop exhausts before round 1. Must return zero rows with the merge
    // schema (not throw on the empty union), matching the oracle's empty
    // relation; encode must still count one symbol per token.
    val dir = docsFixture(Seq(1L -> "a b c", 2L -> "a a"))
    val merges = TextStats.bpeTrain(spark, dir)
    assert(merges.columns.toSeq ==
      Seq("round", "sym_a", "sym_b", "merged", "pair_count"))
    assert(merges.count() == 0)
    val enc = TextStats.bpeEncode(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(enc == Set((1L, 3L, 3L), (2L, 2L, 2L)))
  }

  test("bpe encode: trained merges collapse the corpus to whole-word symbols") {
    // Same fixture as the train test: after the 3 learned merges both
    // vocab words collapse to a single symbol ("ababab" via ab→abab→ababab,
    // "ab" at round 1), so per-doc BPE token count = word count.
    val dir = docsFixture(Seq(1L -> "ababab ababab", 2L -> "ab"))
    val got = TextStats.bpeEncode(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(1L -> ((12L, 2L)), 2L -> ((2L, 1L))))
  }

  test("bpe encode: unmerged symbols still count per character") {
    // One merge dominates ((a,b) count 2); "cd" never merges, so it
    // encodes as 2 single-char symbols; "ab" encodes as 1 after round 1
    // but rounds 2-3 find pairs only in unmerged words ("c d" count 2
    // merges at round 2, leaving round 3 the exhausted-vocab case).
    val dir = docsFixture(Seq(1L -> "ab ab cd", 2L -> "cd"))
    val got = TextStats.bpeEncode(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L)._1 == 6L && got(2L)._1 == 2L)
    // doc1: ab(1)+ab(1)+cd(1)=3 bpe tokens; doc2: cd = 1.
    assert(got(1L)._2 == 3L && got(2L)._2 == 1L)
  }

  test("bpe train+encode match a driver-side reference on random corpora") {
    // Differential check: an independent, obviously-correct driver-side
    // BPE (explicit leftmost-greedy symbol-list merge, no string replace
    // tricks) must agree with the distributed padded-replace pipeline on
    // random small-alphabet corpora — repeated chars make overlapping
    // chains ("ababab") and count ties common, exactly the paths hand
    // fixtures under-sample. Seeded: failures reproduce.
    def applyMerge(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    def refBpe(docs: Seq[String], rounds: Int)
        : (Seq[(Int, String, String, String, Long)], Map[String, Int]) = {
      val words = docs.flatMap(_.split("[^a-z0-9]+").filter(_.nonEmpty))
      var vocab: Map[String, (Vector[String], Long)] = words
        .groupBy(identity).map { case (w, ws) =>
          w -> ((w.split("").filter(_.nonEmpty).toVector, ws.size.toLong)) }
      val merges = Seq.newBuilder[(Int, String, String, String, Long)]
      var r = 1
      var stop = false
      while (r <= rounds && !stop) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((_, (syms, c)) <- vocab; i <- 0 until syms.length - 1)
          pairs((syms(i), syms(i + 1))) =
            pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
        if (pairs.isEmpty) stop = true
        else {
          val ((a, b), pc) = pairs.minBy { case ((a, b), c) => (-c, a, b) }
          merges += ((r, a, b, a + b, pc))
          vocab = vocab.map { case (w, (syms, c)) =>
            w -> ((applyMerge(syms, a, b), c)) }
          r += 1
        }
      }
      (merges.result(), vocab.map { case (w, (syms, _)) => w -> syms.length })
    }
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 6) {
      val docs = Seq.fill(2 + rnd.nextInt(3))(
        Seq.fill(3 + rnd.nextInt(4))(
          Seq.fill(1 + rnd.nextInt(6))(
            if (rnd.nextBoolean()) "a" else "b").mkString).mkString(" "))
      val dir = docsFixture(docs.zipWithIndex.map {
        case (t, i) => (i + 1L) -> t })
      val (expMerges, expSyms) = refBpe(docs, rounds = 3)
      val gotMerges = TextStats.bpeTrain(spark, dir)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
      assert(gotMerges == expMerges, s"docs=$docs")
      val gotEnc = TextStats.bpeEncode(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val expEnc = docs.zipWithIndex.map { case (t, i) =>
        val ws = t.split("[^a-z0-9]+").filter(_.nonEmpty)
        (i + 1L) -> ((ws.map(_.length.toLong).sum,
          ws.map(w => expSyms(w).toLong).sum))
      }.toMap
      assert(gotEnc == expEnc, s"docs=$docs")
    }
  }

  test("bpe train: equal-count tie breaks lexicographically") {
    // (b,a) and (b,c) both count 2 → lexicographic tie-break picks (b,a).
    val dir = docsFixture(Seq(1L -> "ba ba", 2L -> "bc bc"))
    val got = TextStats.bpeTrain(spark, dir, rounds = 1).collect()
    assert(got.length == 1)
    assert((got(0).getString(1), got(0).getString(2), got(0).getLong(4)) ==
      (("b", "a", 2L)))
  }

  test("bigram logprob: corpus-model conditionals, weighted doc mean") {
    // Model from the corpus itself:
    //   bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; prefix counts: a·=3, b·=2.
    //   P(b|a)=1 → log10 0;  P(a|b)=P(c|b)=1/2 → log10 −log10(2).
    // doc 1 "a b a b": 3 bigrams, mean = −log10(2)/3
    // doc 2 "a b c":   2 bigrams, mean = −log10(2)/2
    // doc 3 "x": no bigrams → absent from the result.
    val dir = docsFixture(Seq(1L -> "a b a b", 2L -> "a b c", 3L -> "x"))
    val got = TextStats.bigramLogProb(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 3L && got(2L)._1 == 2L)
    assert(math.abs(got(1L)._2 - (-math.log10(2) / 3)) < 1e-6)
    assert(math.abs(got(2L)._2 - (-math.log10(2) / 2)) < 1e-6)
  }

  test("neardup dedup: cluster survivor is min doc_id, singletons survive") {
    import spark.implicits._
    // docs 1,2 are exact clones (jaccard 1 on 4-gram shingles → one
    // cluster, survivor = min id = 1); doc 3 is an unclustered singleton.
    val dir = TestSpark.tempDir("graft_text_fx")
    Seq((1L, "one two three four five", "en"),
        (2L, "one two three four five", "en"),
        (3L, "alpha beta gamma delta", "fr"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("l44_neardup_dedup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(("en", 1L, 5L), ("fr", 1L, 4L)))
  }

  test("vocab coverage: total-order cut, per-lang OOV mass") {
    import spark.implicits._
    // freq: a:3, b:1, c:1, d:1 → top-2 = {a (count), b (tie broken asc)}.
    // en: 4 tokens, OOV = the c → rate 0.25; fr: 2 tokens, OOV = d → 0.5.
    val dir = TestSpark.tempDir("graft_vocab_fx")
    Seq((1L, "a a b c", "en"), (2L, "a d", "fr"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextStats.vocabCoverage(spark, dir, v = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map("en" -> ((4L, 1L, 0.25)), "fr" -> ((2L, 1L, 0.5))))
  }

  test("lang confusion: declared vs predicted matrix, zero-evidence tie") {
    import spark.implicits._
    // doc 1: en markers declared en (diagonal); doc 2: en markers declared
    // fr (off-diagonal); doc 3: no markers at all → every score ties at 0
    // and the DESC candidate tie-break picks 'zh' on both engines.
    val dir = TestSpark.tempDir("graft_conf_fx")
    Seq((1L, "the and of the", "en"), (2L, "the and of", "fr"),
        (3L, "xyz qrs", "zh"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("l48_lang_confusion")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("en", "en", 1L), ("fr", "en", 1L), ("zh", "zh", 1L)))
  }

  test("char entropy: exact values, zero floor, rounded-value keep flag") {
    val dir = docsFixture(Seq(
      1L -> "aaab", // -(3/4·ln 3/4 + 1/4·ln 1/4)
      2L -> "abab", // ln 2
      3L -> "aaaa")) // 0 — and sig6(0) must stay exactly 0
    val got = TextStats.charEntropy(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1)
    val e1 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(got(0)._2 - e1) < 1e-8)
    assert(math.abs(got(1)._2 - math.log(2.0)) < 1e-8)
    assert(got(2)._2 == 0.0)
    assert(got.forall(!_._3)) // all far below the 2.8 nats threshold
  }

  test("stride chunking: window layout, tail chunk, content digest") {
    val text = "ab" * 250 // length 500 → starts 1, 193, 385
    val dir = docsFixture(Seq(7L -> text))
    val got = Curation.chunkStride(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    assert(got.map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((0L, 1L, 256L), (1L, 193L, 256L), (2L, 385L, 116L)))
    // Content check: the digest is md5 of exactly the window substring.
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0)._4 == hex(text.substring(0, 256)))
    assert(got(2)._4 == hex(text.substring(384, 500)))
  }

  test("fused quality verdict covers zero-token documents") {
    // A doc with no [a-z0-9] characters has NO repetition/LM row; the
    // left-join composition must still emit its rules-family verdict
    // instead of silently dropping it (the inner-join failure mode).
    val dir = docsFixture(Seq(1L -> "!!! ???", 2L -> ("word " * 40).trim))
    val got = llmops.LlmQueries.queries("l40_quality_fused")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(5))).sortBy(_._1)
    assert(got.length == 2)
    assert(got(0) == ((1L, "rules:too_short")))
  }

  test("fused quality verdict is total, consistent, and non-trivial") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val fused = llmops.LlmQueries.queries("l40_quality_fused")(spark, sf).cache()
    // Total: exactly one verdict per document.
    assert(fused.count() == 500 && fused.select($"doc_id").distinct().count() == 500)
    // Consistent with the component operators it fuses: every doc failing
    // the l16 rules carries that family's verdict, and every kept doc
    // passes all four family thresholds on the component outputs.
    val rulesBad = llmops.TextStats.qualityFilter(spark, sf)
      .filter(!$"keep").select($"doc_id", $"reason".as("r16"))
    val mism = fused.join(rulesBad, "doc_id")
      .filter($"reason" =!= concat_ws(":", lit("rules"), $"r16")).count()
    assert(mism == 0)
    val kept = fused.filter($"keep")
    assert(kept.filter($"top_tok_frac" > 0.15 || $"logprob" < -1.5 ||
      $"char_entropy" < 2.8).count() == 0)
    // Non-trivial: the corpus exercises the rules family, at least two of
    // the signal families, and keeps a majority.
    val reasons = fused.groupBy($"reason").count()
      .as[(String, Long)].collect().toMap
    assert(reasons.keys.exists(_.startsWith("rules:")))
    assert(Seq("repetition", "lm_score", "entropy").count(reasons.contains) >= 2,
      reasons.toString)
    assert(reasons("ok") > 250)
    fused.unpersist()
  }

  test("dup span fraction: clones at 1.0, unique at 0.0, partial in between") {
    val a = "one two three four five six seven eight nine ten"
    val c = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // d shares a's first 9 tokens (2 of its 8-gram shingles collide with
    // a's) and then diverges: 10 tokens → 3 shingles, 2 duplicated.
    val d = "one two three four five six seven eight nine alpha"
    val dir = docsFixture(Seq(1L -> a, 2L -> a, 3L -> c, 4L -> d))
    val got = Dedup.dupSpanFrac(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got(0) == ((1L, 3L, 3L, 1.0)))
    assert(got(1) == ((2L, 3L, 3L, 1.0)))
    assert(got(2) == ((3L, 3L, 0L, 0.0)))
    assert(got(3)._3 == 2L && math.abs(got(3)._4 - 2.0 / 3.0) < 1e-8)
  }

  test("span scrub: clones fully removed, partial overlap keeps the tail") {
    val a = "one two three four five six seven eight nine ten"
    val c = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // d shares a's first 9 tokens: its dup shingles at i=1,2 cover
    // positions 1..9, leaving only the 10th token.
    val d = "one two three four five six seven eight nine omega"
    val dir = docsFixture(Seq(1L -> a, 2L -> a, 3L -> c, 4L -> d))
    val got = Dedup.spanScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((10L, 10L, ""))) // clone: every position covered
    assert(got(2L) == ((10L, 10L, "")))
    assert(got(3L) == ((10L, 0L, c))) // untouched doc reassembles verbatim
    assert(got(4L) == ((10L, 9L, "omega")))
  }

  test("decontaminate overlap: exact copy flags, 1-of-11 share stays under") {
    import spark.implicits._
    // doc 10 (id % 10 == 0) is the benchmark; doc 1 is its exact copy
    // (frac 1.0), doc 2 shares 1 of its 5 4-grams (0.2 ≥ τ), doc 4
    // shares 1 of 11 (0.0909 < τ), doc 3 is disjoint (absent).
    val bench = "one two three four five six"
    val dir = docsFixture(Seq(
      10L -> bench, 1L -> bench,
      2L -> "zero one two three four nine eight seven",
      3L -> "alpha beta gamma delta epsilon zeta eta theta",
      4L -> "u1 u2 u3 one two three four v1 v2 v3 v4 v5 v6 v7"))
    val got = Dedup.decontaminateOverlap(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got(1L) == ((3L, 3L, 1.0, true)))
    assert(got(2L) == ((5L, 1L, 0.2, true)))
    assert(got(4L)._1 == 11L && got(4L)._2 == 1L && !got(4L)._4)
    assert(!got.contains(3L) && !got.contains(10L))
  }

  test("dsir weights: target-language docs score above off-target docs") {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_dsir_fx")
    // en uses one vocabulary, zh a disjoint one: every en bucket has a
    // positive log-ratio (target mass above raw mass), zh buckets only
    // the smoothing floor — so en docs MUST outscore zh docs.
    Seq((1L, "alpha beta gamma alpha", "en"),
        (2L, "beta gamma delta", "en"),
        (3L, "uno dos tres cuatro", "zh"),
        (4L, "dos tres uno", "zh"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextStats.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == 4L && got(3L)._1 == 4L)
    Seq(1L, 2L).foreach(en => Seq(3L, 4L).foreach(zh =>
      assert(got(en)._2 > got(zh)._2,
        s"en doc $en (${got(en)._2}) should outscore zh doc $zh (${got(zh)._2})")))
  }

  test("ppl buckets: equal-count thirds per language, head outscores tail") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = TextStats.pplBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val langs = rows.keys.map(_._1).toSet
    langs.foreach { lang =>
      val counts = (0L to 2L).map(b => rows((lang, b))._1)
      // Equal-count split: the integer bucket arithmetic puts sizes within
      // one of each other.
      assert(counts.max - counts.min <= 1, s"$lang: $counts")
      // Head (bucket 0) has the best mean LM score, tail the worst.
      val means = (0L to 2L).map(b => rows((lang, b))._2)
      assert(means(0) > means(1) && means(1) > means(2), s"$lang: $means")
    }
  }

  test("hard negatives: positive and its near-dups excluded, ranks dense, " +
      "scores descend the BM25 order") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val negs = TextStats.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(negs.length == 20)
    assert(negs.map(_._1).toSeq == (1L to 20L), "dense 1..k ranks")
    assert(negs.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) }, "BM25 descending")
    val scores = TextStats.bm25Scores(spark, sf,
      Seq("spark", "join", "window"), 1.2, 0.75)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val pos = scores.minBy { case (id, sc) => (-sc, id) }._1
    assert(!negs.exists(_._2 == pos), "the positive itself is excluded")
    val dupOfPos = graft.llmops.Dedup.jaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, b) if a == pos => b; case (a, b) if b == pos => a }
      .toSet
    assert(negs.forall(n => !dupOfPos(n._2)),
      "near-duplicates of the positive are excluded as false negatives")
  }
}
