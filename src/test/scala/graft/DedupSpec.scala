package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, MinHashSig}
import graft.llmops.{Dedup, Similarity}

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhash_sig matches a driver-side reference computation") {
    import spark.implicits._
    val hs = Seq(3L, -17L, 123456789L, Long.MaxValue, 0L)
    val got = hs.toDF("h").groupBy()
      .agg(GraftFunctions.minhashSig(spark, $"h").as("sig"))
      .head().getSeq[Long](0)
    val P = MinHashSig.P
    val expected = (0 until 32).map { i =>
      hs.map { h0 =>
        val h = ((h0 % P) + P) % P
        (MinHashSig.permA(i) * h + MinHashSig.permB(i)) % P
      }.min
    }
    assert(got == expected)
  }

  test("minhash_sig partial/final merge equals single-group computation") {
    import spark.implicits._
    // Many partitions force map-side partials + a merge path.
    val df = spark.range(0, 1000, 1, 16)
      .select((($"id" * 2654435761L) % 104729L).as("h"), lit(1).as("g"))
    val merged = df.repartition(16).groupBy($"g")
      .agg(GraftFunctions.minhashSig(spark, $"h").as("sig"))
      .head().getSeq[Long](1)
    val single = df.coalesce(1).groupBy($"g")
      .agg(GraftFunctions.minhashSig(spark, $"h").as("sig"))
      .head().getSeq[Long](1)
    assert(merged == single)
  }

  test("adaptive banding derives the documented operating points") {
    // MinHash (Jaccard space: midpoint (r/32)^(1/r) vs the threshold).
    assert(Dedup.rowsFor(0.25) == 2)
    assert(Dedup.rowsFor(0.5) == 4)
    assert(Dedup.rowsFor(0.85) == 8)
    assert(Dedup.rowsFor(0.97) == 16)
    // SRP (cosine → per-bit agreement p = 1 − acos(t)/π first).
    assert(Similarity.bandBitsFor(0.45) == 6)
    assert(Similarity.bandBitsFor(0.9) == 12)
    assert(Similarity.bandBitsFor(0.99) == 12)
  }

  test("l56 high-threshold minhash: verified subset of the exact scan at 0.85") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_a", $"doc_b", $"jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs(Dedup.jaccardPairs(spark, sf).filter($"jaccard" >= 0.85))
    val hi = pairs(Dedup.minhashPairs(spark, sf, threshold = 0.85))
    // Candidates are exact-verified: the 4×8 curve can only MISS, never
    // invent, and every emitted jaccard must equal the brute-force value.
    assert(hi.keySet.subsetOf(exact.keySet),
      s"invented pairs: ${hi.keySet -- exact.keySet}")
    hi.foreach { case (k, j) => assert(j == exact(k)) }
    // Stricter banding admits no pair the wide 8×4 curve misses.
    val l04at = pairs(Dedup.minhashPairs(spark, sf).filter($"jaccard" >= 0.85))
    assert(hi.keySet.subsetOf(l04at.keySet))
  }

  test("simhash_sig equals the column-wise bit-majority formulation") {
    import spark.implicits._
    val toks = Seq((1L, "alpha"), (1L, "beta"), (1L, "gamma"), (1L, "alpha"),
      (2L, "delta"))
      .toDF("doc_id", "tok")
      .select($"doc_id", xxhash64($"tok").as("h"))
    val viaAgg = toks.groupBy($"doc_id")
      .agg(GraftFunctions.simhashSig(spark, $"h").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bitSums = (0 until 64).map(b =>
      sum(when(($"h".bitwiseAND(lit(1L << b))) =!= 0L, 1).otherwise(-1)).as(s"b$b"))
    val viaCols = toks.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id",
        (0 until 64).map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaCols)
  }

  test("array_sum_agg sums elementwise across partitions") {
    import spark.implicits._
    val df = spark.range(0, 100, 1, 8)
      .select(($"id" % 4).as("g"),
        array($"id".cast("double"), lit(1.0), ($"id" * 2).cast("double")).as("v"))
    val got = df.groupBy($"g")
      .agg(GraftFunctions.arraySumAgg(spark, $"v").as("sv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    (0L until 4L).foreach { g =>
      val ids = (0 until 100).filter(_ % 4 == g)
      assert(got(g) == Seq(ids.sum.toDouble, ids.size.toDouble, ids.sum * 2.0))
    }
  }

  test("minhash+LSH recovers the exact jaccard pairs on the test corpus") {
    import spark.implicits._
    val exact = Dedup.jaccardPairs(spark, sf)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(spark, sf)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH output is a subset (recall < 1 at the threshold boundary) and both
    // are exact-verified, so lsh ⊆ exact; on this corpus the near-dups are
    // far above threshold, so recall should be total.
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"missed pairs: ${exact -- lsh}")
  }

  test("incremental minhash equals the full LSH scan restricted to " +
      "cross-split pairs") {
    import spark.implicits._
    // The defining property of the incremental path: indexing the corpus
    // once and probing with the batch must find EXACTLY the pairs the
    // full-corpus scan finds between the two sides — the split changes
    // the work, never the answer (signatures are per-doc aggregates).
    val full = Dedup.minhashPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.flatMap { case (a, b, j) =>
      // Orient each full-scan pair as (corpus, batch); drop same-side ones.
      if (a % 5 != 0 && b % 5 == 0) Some((a, b, j))
      else if (b % 5 != 0 && a % 5 == 0) Some((b, a, j))
      else None
    }
    val inc = Dedup.incrementalMinhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == expected,
      s"extra: ${inc -- expected}; missed: ${expected -- inc}")
    // The property is only meaningful if the split actually crosses pairs.
    assert(expected.nonEmpty, "fixture has no cross-split near-dup pair")
  }

  test("jaccardPairs maxDf cap drops only capped-shingle evidence") {
    // With a df cap of 1 no shingle can pair anything: empty result.
    assert(Dedup.jaccardPairs(spark, sf, maxDf = Some(1)).isEmpty)
  }

  test("SRP-LSH recovers planted near-identical embeddings (brute-force recall)") {
    // The sketch's designed operating point (Similarity.scala: P(bit) =
    // 1−θ/π ⇒ ~97% pair recall at cos 0.99, ~3% at cos 0.45): plant ten
    // clones with 1% additive noise (cos ≈ 0.9999) among random vectors
    // and demand LSH ≈ brute force there. The corpus-level bench recall
    // (l08_recall_vs_l07) measures the OTHER end — the testdata's only
    // exact pairs sit at cos ≈ 0.47, where the designed hit rate is ~2% —
    // so this fixture is what "recall" means for a near-dup scan.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 64
    def vec() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, s"l${i % 5}", vec()))
    val planted = (0 until 10).map { i =>
      val (_, lab, v) = base(i)
      (100L + i, lab, v.map(x => x + (rnd.nextGaussian() * 0.01).toFloat))
    }
    val dir = TestSpark.tempDir("graft_lsh_fx")
    (base ++ planted).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_a", $"vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.embedDupPairs(spark, dir, threshold = 0.99))
    val lsh = pairs(Similarity.embedDupPairsLsh(spark, dir, threshold = 0.99))
    assert(exact.size >= 10, s"brute force must find the planted pairs: $exact")
    // Candidates are exact-verified, so LSH can only MISS, never invent.
    assert(lsh.subsetOf(exact))
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"high-sim recall $recall (lsh $lsh vs exact $exact)")
  }

  test("source overlap matches an independent self-join recompute") {
    import spark.implicits._
    // The operator expands pairs in-row from per-shingle posting lists;
    // this recompute takes the classic self-join route over raw shingle
    // STRINGS (no strHash60) — agreement checks both the pair expansion
    // and that hashing introduced no collisions at this scale.
    val got = Dedup.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val sh = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", explode(llmops.TextOps.shingles(
        llmops.TextOps.tokens($"text"), 8)).as("sg"))
      .distinct().cache()
    val cnt = sh.groupBy($"source").agg(count(lit(1)).as("ns"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = sh.as("a").join(sh.as("b"),
        col("a.sg") === col("b.sg") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("x"), col("b.source").as("y"))
      .agg(count(lit(1)).as("inter")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    sh.unpersist()
    assert(got.keySet == expected.keySet)
    expected.foreach { case (p@(a, b), inter) =>
      assert(got(p) == (cnt(a), cnt(b), inter), s"pair $p")
    }
  }

  test("winnowing fingerprints: reference-exact and every window covered") {
    import spark.implicits._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and the quick cat"),
      (2L, "aaaaaaaaaaaaaaaaaaaa"), // degenerate: all k-grams identical
      (3L, "short"))                // below k — must produce no rows
    val dir = TestSpark.tempDir("graft_win_fx")
    texts.map { case (id, t) => (id, t, "en", "fx", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = llmops.TextStats.winnowFingerprints(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Independent reference: the shared positional recompute (also the
    // FunctionProperties law against the rolling kernel).
    val (k, w) = (8, 4)
    val ref = texts.flatMap { case (id, t) =>
      WinnowReference.fingerprints(t, k, w).map { case (pos, h) => (id, pos, h) }
    }.toSet
    assert(got == ref, s"winnow mismatch: ${got.diff(ref)} / ${ref.diff(got)}")
    assert(!got.exists(_._1 == 3L))
    // The guarantee mod-sampling lacks: every window of w consecutive
    // k-gram positions contains at least one selected fingerprint.
    texts.filter(_._2.length >= k + w - 1).foreach { case (id, t) =>
      val sel = got.collect { case (d, pos, _) if d == id => pos }
      (1 to (t.length - k + 1) - w + 1).foreach { s =>
        assert((s until s + w).exists(q => sel.contains(q.toLong)),
          s"doc $id window $s uncovered")
      }
    }
  }

  test("SRP-LSH mid-sim operating point (8×6 bands) recalls cos≈0.5 pairs") {
    // l51's regime: pairs planted at cos ≈ 0.5 (v + √3·noise), where the
    // default 4×12 banding is blind by design (per-band p^12 ≈ 0.006) and
    // the 8×6 point's p^6 ≈ 0.08 per band × 8 bands lands ~0.5 recall.
    // Deterministic fixture (fixed seed + fixed planes) so the measured
    // recalls are exact, not statistical.
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dim = 64
    def vec() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, s"l${i % 5}", vec()))
    val planted = (0 until 20).map { i =>
      val (_, lab, v) = base(i)
      (100L + i, lab,
        v.map(x => x + (rnd.nextGaussian() * math.sqrt(3.0)).toFloat))
    }
    val dir = TestSpark.tempDir("graft_lsh_mid_fx")
    (base ++ planted).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_a", $"vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // TRUE all-pairs brute force (no label blocking): at threshold 0.3 a
    // few random cross-label pairs qualify too, and LSH rightly finds
    // some — the subset/recall algebra needs the unblocked ground truth.
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val exactSims = e.as("a")
      .join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        graft.functions.GraftFunctions.cosineSim(spark, $"a.v", $"b.v").as("sim"))
      .filter($"sim" >= 0.3).cache()
    val exact = pairs(exactSims)
    val mid = pairs(Similarity.embedDupPairsLsh(spark, dir, threshold = 0.3,
      bandBits = 6))
    // Explicit 12: the default banding is now threshold-ADAPTIVE (a 0.3
    // threshold derives 4-bit bands), and this test contrasts the fixed
    // narrow profile against the mid-sim one.
    val narrow = pairs(Similarity.embedDupPairsLsh(spark, dir,
      threshold = 0.3, bandBits = 12))
    assert(exact.size >= 15, s"brute force must find the planted pairs: $exact")
    // Candidates are exact-verified: both operating points can only MISS.
    assert(mid.subsetOf(exact) && narrow.subsetOf(exact))
    val midRecall = mid.intersect(exact).size.toDouble / exact.size
    val narrowRecall = narrow.intersect(exact).size.toDouble / exact.size
    assert(midRecall >= 0.3,
      s"mid-sim recall $midRecall (mid $mid vs exact $exact)")
    assert(midRecall > narrowRecall,
      s"8×6 banding must beat 4×12 at cos≈0.5: $midRecall vs $narrowRecall")
    // Multi-probe at the SAME 8×6 banding (l62): one min-margin flip per
    // band recovers most Hamming-1 band misses, at ≤2× the candidate
    // volume (one-sided probing: exactly 2 collision events per band).
    // The ≥0.7 recall pin applies to the cos≥0.45 regime the l62 sidecar
    // claim names — this fixture's exact set reaches down to sim 0.3,
    // where per-bit agreement is too low for ANY 1-flip scheme; on the
    // full set the pin is monotonicity over single-probe.
    val mp = pairs(Similarity.embedDupPairsLshMp(spark, dir,
      threshold = 0.3, bandBits = 6))
    assert(mp.subsetOf(exact), "multi-probe candidates are exact-verified")
    val exactHi = pairs(exactSims.filter($"sim" >= 0.45))
    val mpRecall = mp.intersect(exact).size.toDouble / exact.size
    val mpHiRecall = mp.intersect(exactHi).size.toDouble / exactHi.size
    exactSims.unpersist(blocking = false)
    assert(exactHi.size >= 10, s"fixture must plant cos>=0.45 pairs: $exactHi")
    assert(mpHiRecall >= 0.7,
      s"multi-probe recall at cos>=0.45 $mpHiRecall (mp $mp vs $exactHi)")
    assert(mpRecall >= midRecall,
      s"multi-probe can only add candidates: $mpRecall vs $midRecall")
  }

  test("semantic dedup: kmeans blocking ⊆ all-pairs; near-clones recalled") {
    // Same planted-clone fixture idea as the SRP test: clones at 1% noise
    // (cos ≈ 0.9999) sit deep inside a Lloyd cell, so the kmeans blocker
    // must recover them; blocking can only MISS cross-cell pairs, never
    // invent one, and every emitted sim must equal the brute-force value.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 64
    def vec() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, s"l${i % 5}", vec()))
    val planted = (0 until 10).map { i =>
      val (_, lab, v) = base(i)
      (100L + i, lab, v.map(x => x + (rnd.nextGaussian() * 0.01).toFloat))
    }
    val dir = TestSpark.tempDir("graft_sem_fx")
    (base ++ planted).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // All-pairs brute force at the same threshold (no blocking at all).
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val brute = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        graft.Canon.sig6(
          graft.functions.GraftFunctions.cosineSim(spark, $"a.v", $"b.v")).as("sim"))
      .filter($"sim" >= 0.99)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val all = rows(brute)
    val blocked = rows(Similarity.semanticDedup(spark, dir, threshold = 0.99))
    assert(all.size >= 10, s"brute force must find the planted pairs: $all")
    assert(blocked.subsetOf(all), s"invented pairs: ${blocked -- all}")
    val recall = blocked.size.toDouble / all.size
    assert(recall >= 0.9, s"planted recall $recall (blocked $blocked vs $all)")
  }

  test("k-center sampling: greedy farthest-point invariants vs a driver replay") {
    // Gonzalez greedy on the real sf0.001 embeddings, validated against an
    // independent driver-side replay of the same rule: seed = smallest
    // vec_id, then argmax of the sig6-rounded min cosine distance to the
    // selected set, ties to the smallest id.
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.kcenterSample(spark, dir, k = 6).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 until 6), s"rounds: ${got.toSeq}")
    assert(got.map(_._2).distinct.length == 6, "picks must be distinct")
    // Driver replay from raw vectors.
    val e = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).sortBy(_._1)
    def cosd(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      Sig9(1.0 - dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    var selected = Vector(e.head._1 -> e.head._2)
    var expect = Vector((0, e.head._1, 0.0))
    var dmin = e.map { case (id, v) => id -> cosd(v, e.head._2) }.toMap
    (1 until 6).foreach { r =>
      val pool = e.filterNot(p => selected.exists(_._1 == p._1))
      val pick = pool.maxBy(p => (dmin(p._1), -p._1.toDouble))
      expect :+= ((r, pick._1, dmin(pick._1)))
      selected :+= pick
      dmin = dmin.map { case (id, d) =>
        id -> math.min(d, cosd(e.find(_._1 == id).get._2, pick._2)) }
    }
    assert(got.toVector == expect,
      s"spark ${got.toSeq} vs driver replay $expect")
  }

  test("MMR re-ranking: greedy λ·rel − μ·max-sim replay from raw vectors") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.mmrRerank(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 until Similarity.MmrK))
    assert(got.map(_._2).distinct.length == Similarity.MmrK)
    // Independent driver replay: pool cut, then greedy picks.
    val e = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      Sig9(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val qv = e(0L)
    val pool = e.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cos(v, qv)) }
      .sortBy(p => (-p._3, p._1)).take(Similarity.MmrPoolK)
    var sel = Vector(pool.minBy(p => (-p._3, p._1)))
    var expect = Vector((0, sel.head._1, Sig9(Similarity.MmrLambda * sel.head._3)))
    (1 until Similarity.MmrK).foreach { r =>
      val next = pool.filterNot(p => sel.exists(_._1 == p._1))
        .map { p =>
          val ms = sel.map(s => cos(p._2, s._2)).max
          (p._1, p._2, p._3,
            Sig9(Similarity.MmrLambda * p._3 - Similarity.MmrMu * ms))
        }.minBy(p => (-p._4, p._1))
      expect :+= ((r, next._1, next._4))
      sel :+= ((next._1, next._2, next._3))
    }
    assert(got.toVector == expect,
      s"spark ${got.toSeq} vs driver replay $expect")
  }
}
