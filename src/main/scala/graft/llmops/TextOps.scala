package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Shared text primitives for the LLM-data-pipeline operators (SURVEY §2.4 L*).
  *
  * Everything here stays inside whole-stage codegen: tokenization, shingling
  * and hashing are built from `org.apache.spark.sql.functions` higher-order
  * functions (no UDFs), so the hot path is a single generated loop per row.
  */
object TextOps {

  /** Lowercased alphanumeric tokens; empty strings dropped.
    * Mirrors the DuckDB oracle `list_filter(string_split_regex(lower(text),
    * '[^a-z0-9]+'), x -> x <> '')` exactly.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), x => x =!= "")

  /** Word n-gram shingles ("a b c d") over the token array. Guarded so short
    * docs yield an empty array (Spark's `sequence(1, n)` with n<1 would count
    * DOWN, not produce an empty sequence).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** documents with a distinct (doc_id, shingle) relation. */
  def docShingles(s: SparkSession, dir: String, n: Int = 4): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", explode(shingles(tokens($"text"), n)).as("s"))
      .distinct()
  }

  /** Same relation with shingles pre-hashed to 64-bit — the join/count path
    * for set-similarity: an 8-byte key shuffles ~3× less than the ~25-char
    * shingle string and compares in one instruction. Collision probability
    * across a 10M-shingle corpus is ~10⁻⁶ (birthday bound on 2⁶⁴).
    */
  def docShingleHashes(s: SparkSession, dir: String, n: Int = 4): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", explode(shingles(tokens($"text"), n)).as("s"))
      .select($"doc_id", xxhash64($"s").as("h"))
      .distinct()
  }
}

/** L1 exact + L2 near deduplication over `documents`.
  *
  * - exact: md5-of-text grouping (one shuffle on the 32-char digest, not the
  *   full text — at 100 TB the shuffle key is 32 bytes/row regardless of doc
  *   size, and the group-by is partial-aggregated map-side).
  * - n-gram Jaccard: inverted-index self-join on distinct word-4-gram
  *   shingles. Join explodes only docs sharing a shingle; with 4-gram
  *   shingles the posting lists stay tiny, so the pair space is ~linear in
  *   corpus size rather than O(n²).
  * - MinHash+LSH: 32 permutations banded 8×4; only band-collision candidates
  *   are verified exactly. This is the 100 TB path: signature size is
  *   constant per doc and candidate generation is a hash-shuffle on
  *   (band_id, band_key).
  */
object Dedup {
  import TextOps._

  // MinHash permutation parameters: h_i(x) = (a_i*x + b_i) mod p over the
  // 32-bit murmur3 shingle hash. Fixed seed => deterministic across runs.
  private val P = 2147483647L // 2^31 - 1, prime
  private val NumPerm = 32
  private val Bands = 8
  private val Rows = NumPerm / Bands
  private val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NumPerm)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
      Array.fill(NumPerm)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** L1a: duplicate groups — digest, member count, canonical survivor. */
  def exactDupGroups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .groupBy(md5($"text").as("h"))
      .agg(count(lit(1)).as("cnt"), min($"doc_id").as("keep_id"))
  }

  /** L1b: the deduplicated corpus — first doc_id per digest survives. */
  def exactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(md5($"text")).orderBy($"doc_id")
    Tables.load(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang", $"source")
  }

  /** Exact Jaccard similarity for all pairs sharing >=1 shingle, thresholded.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    */
  def jaccardPairs(s: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    import s.implicits._
    val sh = docShingleHashes(s, dir).cache()
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.as("ca"), $"doc_a" === $"ca.doc_id")
      .join(counts.as("cb"), $"doc_b" === $"cb.doc_id")
      .select($"doc_a", $"doc_b",
        ($"inter".cast("double") / ($"ca.n" + $"cb.n" - $"inter")).as("jaccard"))
      .filter($"jaccard" >= threshold)
  }

  /** MinHash signature per doc: one row, 32 min-aggregates (columnar, no UDF). */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = docShingles(s, dir)
      .select($"doc_id", pmod(hash($"s").cast("long"), lit(P)).as("h"))
    val mins = (0 until NumPerm).map(i =>
      min(pmod(lit(permA(i)) * $"h" + lit(permB(i)), lit(P))).as(s"m$i"))
    sh.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
  }

  /** L2b: MinHash+LSH candidate pairs, exact-verified. Same output contract
    * as [[jaccardPairs]] but only pairs colliding in >=1 of 8 bands are
    * scored — the pair generation never goes quadratic. Pairs right at the
    * threshold can be missed (1-(1-j^4)^8 recall curve): that is inherent to
    * LSH and is why the oracle-checked query is [[jaccardPairs]].
    */
  def minhashPairs(s: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    import s.implicits._
    val sig = minhashSignatures(s, dir)
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band_id"),
        hash((b * Rows until (b + 1) * Rows).map(i => col(s"m$i")): _*).as("band_key"))
    }
    val banded = sig.select($"doc_id", explode(array(bandCols: _*)).as("bk"))
      .select($"doc_id", $"bk.band_id", $"bk.band_key")
    val cand = banded.as("x").join(banded.as("y"),
        $"x.band_id" === $"y.band_id" && $"x.band_key" === $"y.band_key" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    // Exact verification on the candidate set only.
    val sh = docShingleHashes(s, dir).cache()
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    cand.join(sh.as("a"), $"doc_a" === $"a.doc_id")
      .join(sh.as("b"), $"doc_b" === $"b.doc_id" && $"a.h" === $"b.h")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("inter"))
      .join(counts.as("ca"), $"doc_a" === $"ca.doc_id")
      .join(counts.as("cb"), $"doc_b" === $"cb.doc_id")
      .select($"doc_a", $"doc_b",
        ($"inter".cast("double") / ($"ca.n" + $"cb.n" - $"inter")).as("jaccard"))
      .filter($"jaccard" >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit signature from token hashes, 4×16-bit
    * band blocking, hamming-distance verification via bit_count(xor).
    * No SQL oracle (hash-function specific); ScalaTest asserts it recovers
    * the Jaccard near-dup pairs on the test corpus.
    */
  def simhashPairs(s: SparkSession, dir: String, maxHamming: Int = 6): DataFrame = {
    import s.implicits._
    val toks = Tables.load(s, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .select($"doc_id", xxhash64($"tok").as("h"))
    // For each of 64 bits: +1 if set else -1; sign of the sum is the bit.
    val bitSums = (0 until 64).map(b =>
      sum(when(($"h".bitwiseAND(lit(1L << b))) =!= 0L, 1).otherwise(-1)).as(s"b$b"))
    val sig = toks.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id",
        (0 until 64).map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("sig"))
    val banded = sig.select($"doc_id", $"sig",
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_id"),
            shiftrightunsigned($"sig", b * 16).bitwiseAND(lit(0xFFFFL)).as("band_key"))): _*)).as("bk"))
      .select($"doc_id", $"sig", $"bk.band_id", $"bk.band_key")
    banded.as("x").join(banded.as("y"),
        $"x.band_id" === $"y.band_id" && $"x.band_key" === $"y.band_key" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        bit_count($"x.sig".bitwiseXOR($"y.sig")).as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }
}
