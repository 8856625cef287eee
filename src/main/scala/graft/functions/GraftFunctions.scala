package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration + Column-API wrappers for graft's native expressions.
  *
  * Two paths, per the standard extension mechanism:
  * - `spark.sql.extensions=graft.functions.GraftExtensions` (or
  *   `builder.withExtensions`) injects at session build;
  * - [[GraftFunctions.ensureRegistered]] registers into an existing session
  *   (idempotent), so library code works on sessions it didn't build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.specs.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftFunctions {

  private def foldableInt(what: String, e: Expression): Int = {
    require(e.foldable, s"$what must be a literal, got $e")
    e.eval(null) match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == n,
        s"$name takes exactly $n argument(s), got ${es.length}")
      build(es)
    }

  private[functions] val specs: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      arity("array_dot", 2)(es => ArrayDot(es(0), es(1)))),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      arity("cosine_sim", 2)(es => CosineSim(es(0), es(1)))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      arity("minhash_sig", 1)(es => MinHashSig(es(0)))),
    (FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      arity("simhash_sig", 1)(es => SimHashSig(es(0)))),
    (FunctionIdentifier("array_sum_agg"),
      new ExpressionInfo(classOf[ArraySumAgg].getName, "array_sum_agg"),
      arity("array_sum_agg", 1)(es => ArraySumAgg(es(0)))),
    (FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowPacked].getName, "winnow_fps"),
      arity("winnow_fps", 3)(es => {
        // Validated at the knob, not deep in the kernel (the LoopConf
        // convention): a bad k would otherwise surface as a per-row
        // ArrayIndexOutOfBounds inside codegen'd execution.
        val k = foldableInt("winnow_fps k", es(1))
        val w = foldableInt("winnow_fps w", es(2))
        require(k > 0 && w > 0,
          s"winnow_fps k and w must be positive, got k=$k w=$w")
        WinnowPacked(es(0), k, w)
      })),
    (FunctionIdentifier("topk_agg"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
      arity("topk_agg", 3)(es => {
        val k = foldableInt("topk_agg k", es(2))
        require(k > 0 && k <= 1024,
          s"topk_agg k must be in [1, 1024], got $k")
        TopKAgg(es(0), es(1), k)
      })),
    (FunctionIdentifier("freq_items_agg"),
      new ExpressionInfo(classOf[FreqItemsAgg].getName, "freq_items_agg"),
      arity("freq_items_agg", 2)(es => {
        val m = foldableInt("freq_items_agg maxMapSize", es(1))
        require(m >= 8 && (m & (m - 1)) == 0,
          s"freq_items_agg maxMapSize must be a power of 2 >= 8, got $m")
        FreqItemsAgg(es(0), m)
      })),
    // Spark ships bloom-filter expressions for its own runtime-filter
    // injection but does not register them as SQL functions; exposing them
    // makes the classic "build sketch, prune map-side" pattern (l31
    // decontamination) available without a UDF or a driver-side collect.
    (FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      arity("bloom_agg", 3)(es =>
        org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          es(0), es(1), es(2), 0, 0))),
    (FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      arity("bloom_contains", 2)(es =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          es(0), es(1)))))

  /** Register graft functions into an already-built session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    specs.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
  }

  def arrayDot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("array_dot", a, b)
  }

  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("cosine_sim", a, b)
  }

  /** MinHash signature aggregate over a bigint hash column (32 perms). */
  def minhashSig(spark: SparkSession, h: Column): Column = {
    ensureRegistered(spark)
    call_function("minhash_sig", h)
  }

  /** SimHash signature aggregate over a bigint hash column (64 bits). */
  def simhashSig(spark: SparkSession, h: Column): Column = {
    ensureRegistered(spark)
    call_function("simhash_sig", h)
  }

  /** Elementwise-sum aggregate over an array<double> column. */
  def arraySumAgg(spark: SparkSession, v: Column): Column = {
    ensureRegistered(spark)
    call_function("array_sum_agg", v)
  }

  /** Bounded top-k aggregate: k smallest (ord, id) pairs, rank-ordered. */
  def topkAgg(spark: SparkSession, ord: Column, id: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function("topk_agg", ord, id,
      org.apache.spark.sql.functions.lit(k))
  }

  /** Frequent-items sketch aggregate over a bigint key column: returns
    * struct(max_err, items: array<struct<item, est, lb, ub>>) — see
    * [[FreqItemsAgg]] for the verdict-not-estimate gate discipline.
    */
  def freqItemsAgg(spark: SparkSession, key: Column,
                   maxMapSize: Int = 1024): Column = {
    ensureRegistered(spark)
    call_function("freq_items_agg", key,
      org.apache.spark.sql.functions.lit(maxMapSize))
  }

  /** Packed winnowing fingerprints (hash << 32 | pos) of a text column. */
  def winnowFps(spark: SparkSession, text: Column, k: Int, w: Int): Column = {
    ensureRegistered(spark)
    call_function("winnow_fps", text,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
  }
}
