package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.Curation

/** Invariants of the corpus-curation operators (split / sample / pack /
  * redact / mix) that the DuckDB hash-match can't express: stability under
  * corpus growth, conservation laws, and idempotence.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("split assignment is total, deterministic, and growth-stable") {
    import spark.implicits._
    val full = Curation.splitAssign(spark, sf).cache()
    val n = full.count()
    assert(n == 500)
    val bySplit = full.groupBy($"split").count().as[(String, Long)]
      .collect().toMap
    assert(bySplit.keySet == Set("train", "validation", "test"))
    // ~90/5/5 with md5 uniformity; wide tolerance, it's 500 draws.
    assert(bySplit("train") > 400 && bySplit("train") < 480)
    // Growth stability: the assignment of a document depends only on its
    // own key, so any subset agrees with the full corpus (the property
    // count-based or random splits lack).
    val sub = Tables.load(spark, sf, "documents").filter($"doc_id" < 100)
    val subAssign = Curation.splitAssign(spark, sf)
      .join(sub.select("doc_id"), "doc_id")
    val disagree = subAssign.as("a").join(full.as("b"), "doc_id")
      .filter($"a.split" =!= $"b.split").count()
    assert(disagree == 0)
    full.unpersist()
  }

  test("stratified sample keeps per-language rates and is a strict filter") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val kept = Curation.stratifiedSample(spark, sf).cache()
    val total = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val sampled = kept.groupBy($"lang").count().as[(String, Long)].collect().toMap
    // en is downsampled hardest; zh keeps everything.
    assert(sampled("en") < total("en"))
    assert(sampled("zh") == total("zh"))
    // Every kept row exists in the corpus (filter, not transform).
    assert(kept.join(docs, "doc_id").count() == kept.count())
    kept.unpersist()
  }

  test("sequence packing conserves tokens and respects the chunk layout") {
    import spark.implicits._
    val packed = Curation.packSequences(spark, sf, budget = 2048).cache()
    val totalPacked = packed.agg(sum($"chunk_tokens")).head().getLong(0)
    val totalTokens = Tables.load(spark, sf, "documents")
      .select(size(llmops.TextOps.tokens($"text")).cast("long").as("n"))
      .agg(sum($"n")).head().getLong(0)
    assert(totalPacked == totalTokens) // every token lands in exactly one chunk
    // Chunk ids are dense from 0 per (lang, shard) stream:
    // max(chunk_id) == count-1.
    val holes = packed.groupBy($"lang", $"shard")
      .agg(max($"chunk_id").as("mx"), count(lit(1)).as("cnt"))
      .filter($"mx" =!= $"cnt" - 1).count()
    assert(holes == 0)
    packed.unpersist()
  }

  test("redaction removes every digit and is idempotent") {
    import spark.implicits._
    val red = Curation.redactPii(spark, sf).cache()
    assert(red.filter($"clean_text".rlike("[0-9]")).count() == 0)
    // Re-redacting redacted text changes nothing (no '<NUM>'-eating).
    val again = red.select($"doc_id",
      regexp_replace(regexp_replace($"clean_text",
        "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+", "<EMAIL>"),
        "[0-9]+", "<NUM>").as("c2"))
    val changed = red.join(again, "doc_id")
      .filter($"clean_text" =!= $"c2").count()
    assert(changed == 0)
    red.unpersist()
  }

  test("mix rates flatten the corpus to a uniform source mix") {
    import spark.implicits._
    val rates = Curation.mixRates(spark, sf).as[(String, Long, Double)]
      .collect()
    // Expected post-sampling count n*rate is equal across sources (up to
    // the rate-1.0 cap) — that's the definition of flattening.
    val uncapped = rates.filter(_._3 < 1.0).map(r => r._2 * r._3)
    if (uncapped.length > 1) {
      val mx = uncapped.max; val mn = uncapped.min
      assert((mx - mn) / mx < 1e-6)
    }
    assert(rates.forall(r => r._3 > 0.0 && r._3 <= 1.0))
  }

  test("source quota == the window formulation it replaces") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // The bounded TopKAgg plan must land row-for-row on the
    // row_number-window plan it is the scale-correct substitute for.
    val agg = Curation.sourceQuota(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    val k = Curation.QuotaK // the shared registry constant, not a literal
    val w = Window.partitionBy($"source")
      .orderBy($"n_chars".desc, $"doc_id")
    val win = graft.Tables.load(spark, sf, "documents")
      .select($"source", row_number().over(w).cast("long").as("rank"),
        $"doc_id", $"n_chars")
      .filter($"rank" <= k)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(agg == win)
    // Quota is min(k, source size) — computed from the fixture, not
    // hard-coded, so a regenerated corpus with a small source can't fail
    // this spuriously.
    val perSource = graft.Tables.load(spark, sf, "documents")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(agg.groupBy(_._1).forall { case (src, rows) =>
      rows.size == math.min(k.toLong, perSource(src)) })
  }
}
