package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The fused native expressions must agree bit-for-bit with the composable
  * higher-order-function rendering (same left-to-right summation), in both
  * the interpreted and whole-stage-codegen paths, and resolve through SQL
  * once registered.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.5, -0.5, 0.0), Array(0.5, 0.5, 1.0)),
      (3L, Array(1e-8, 2e8, -3.3), Array(7.7, 1e-9, 2.5))
    ).toDF("id", "a", "b")
  }

  test("array_dot and cosine_sim match the zip_with/aggregate rendering") {
    import spark.implicits._
    val df = vecs.select($"id",
      GraftFunctions.arrayDot(spark, $"a", $"b").as("dot_native"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (s, v) => s + v)
        .as("dot_hof"),
      GraftFunctions.cosineSim(spark, $"a", $"b").as("cos_native"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"dot mismatch id=${r.getLong(0)}")
      val a = r.getDouble(1)
      assert(!r.getDouble(3).isNaN)
      val _ = a
    }
    // cosine identity: cos(a,a) == 1 exactly for the fused kernel
    val selfCos = vecs.select(GraftFunctions.cosineSim(spark, $"a", $"a"))
      .collect().map(_.getDouble(0))
    selfCos.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("registered functions resolve from SQL text") {
    GraftFunctions.ensureRegistered(spark)
    vecs.createOrReplaceTempView("vexp_test")
    val r = spark.sql(
      "SELECT id, array_dot(a, b) AS d, cosine_sim(a, b) AS c FROM vexp_test ORDER BY id")
      .collect()
    assert(r.length == 3)
    assert(r(0).getDouble(1) == 32.0) // 1*4 + 2*5 + 3*6
  }

  test("srp probe signature: per-band min-margin bit flipped, codegen == " +
      "interpreted == hand reference") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    // 4 planes in 2-bit bands over 2-dim vectors: margins are hand-sized
    // so the expected flip per band is unambiguous.
    val planes = Array(
      Array(1.0, 0.0),   // p0: margin |x|
      Array(0.0, 1.0),   // p1: margin |y|
      Array(1.0, 1.0),   // p2: margin |x+y|
      Array(-1.0, 1.0))  // p3: margin |y-x|
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("t_probe_sig")))
      reg.registerFunction(FunctionIdentifier("t_probe_sig"),
        new ExpressionInfo(
          classOf[graft.functions.SrpProbeSignature].getName, "t_probe_sig"),
        es => graft.functions.SrpProbeSignature(es.head, planes, 2))
    if (!reg.functionExists(FunctionIdentifier("t_sig")))
      reg.registerFunction(FunctionIdentifier("t_sig"),
        new ExpressionInfo(
          classOf[graft.functions.SrpSignature].getName, "t_sig"),
        es => graft.functions.SrpSignature(es.head, planes))
    def expr(c: Column, bb: Int) = { require(bb == 2); call_function("t_probe_sig", c) }
    def sigExpr(c: Column) = call_function("t_sig", c)
    // v = (3, -1): dots (3, -1, 2, -4) → sig bits 0101 reversed: p0=1,
    // p1=0, p2=1, p3=0 → sig = 0b0101 = 5. Margins (3, 1, 2, 4): band 0
    // (p0,p1) min is p1 → flip bit 1; band 1 (p2,p3) min is p2 → flip
    // bit 2. probe sig = 5 ^ 0b0010 ^ 0b0100 = 5 ^ 6 = 3.
    val df = Seq((1L, Array(3.0, -1.0))).toDF("id", "v")
    val got = df.select(sigExpr($"v").as("s"), expr($"v", 2).as("ps")).head()
    assert(got.getLong(0) == 5L, s"sig ${got.getLong(0)}")
    assert(got.getLong(1) == 3L, s"probe sig ${got.getLong(1)}")
    // Interpreted path agrees with codegen.
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(expr($"v", 2)).head().getLong(0)
      assert(interp == 3L)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val withCodegen = vecs.select(GraftFunctions.cosineSim(spark, $"a", $"b"))
      .collect().map(_.getDouble(0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = vecs.select(GraftFunctions.cosineSim(spark, $"a", $"b"))
        .collect().map(_.getDouble(0))
      assert(withCodegen.toSeq == interpreted.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
