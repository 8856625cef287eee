package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused vector kernels as native Catalyst expressions with `doGenCode`.
  *
  * The composable rendering (`aggregate(zip_with(a, b, _*_), 0, _+_)`)
  * allocates an intermediate array per row pair and walks it twice; these
  * expressions run one fused loop inside whole-stage codegen — the
  * difference between O(pairs·dim) arithmetic and O(pairs·dim) arithmetic
  * plus O(pairs) allocations on a 100 TB similarity scan. Element nulls are
  * not expected (embedding vectors are dense); both sides must be
  * array<double>.
  *
  * Summation is left-to-right, matching both the higher-order-function
  * rendering and the DuckDB oracle, so results are bit-identical.
  */
abstract class FusedVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ over min(len(a), len(b)). */
case class ArrayDot(left: Expression, right: Expression)
    extends FusedVectorExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Query-adaptive MULTI-PROBE key (Lv et al., VLDB 2007, via the SRP
  * rendering): the [[SrpSignature]] with, in each `bandBits`-wide band,
  * the single MINIMUM-|margin| bit flipped (ties → lowest plane index).
  * A vector's nearest hyperplane is the bit most likely to disagree with
  * a true near-neighbor's signature, so probing exactly that one flipped
  * bucket per band buys most of the Hamming-1 recall mass at 2× the key
  * volume — where exhaustive 1-flip probing costs (bandBits+1)×. Same
  * fused-loop posture as SrpSignature: margins come from the identical
  * dot products that produce the sign bits, so the DuckDB oracle
  * reproduces both from one projection CTE.
  */
case class SrpProbeSignature(child: Expression, planes: Array[Array[Double]],
                             bandBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_probe_signature requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    var bandMin = Double.NaN
    var bandArg = -1
    while (p < planes.length) {
      val plane = planes(p)
      var acc = 0.0
      var i = 0
      val d = math.min(n, plane.length)
      while (i < d) { acc += v.getDouble(i) * plane(i); i += 1 }
      if (acc >= 0) sig |= 1L << p
      val m = math.abs(acc)
      // argmin with the DuckDB mirror's NaN-LAST total order (ORDER BY
      // abs(dot), p): a finite margin always beats NaN, ties keep the
      // lowest plane, and an all-NaN band flips its first plane — bandArg
      // can never escape the current band (a NaN band previously left it
      // pointing into an earlier, already-flipped band).
      if (bandArg < 0 || m < bandMin || (bandMin != bandMin && m == m)) {
        bandMin = m; bandArg = p
      }
      if ((p + 1) % bandBits == 0) {
        sig ^= 1L << bandArg
        bandMin = Double.NaN
        bandArg = -1
      }
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val bMin = ctx.freshName("bMin")
      val bArg = ctx.freshName("bArg")
      s"""
         |long $sig = 0L;
         |double $bMin = Double.NaN;
         |int $bArg = -1;
         |for (int $p = 0; $p < $mat.length; $p++) {
         |  double $acc = 0.0;
         |  int $d = java.lang.Math.min($v.numElements(), $mat[$p].length);
         |  for (int $i = 0; $i < $d; $i++) {
         |    $acc += $v.getDouble($i) * $mat[$p][$i];
         |  }
         |  if ($acc >= 0) $sig |= 1L << $p;
         |  double $m = java.lang.Math.abs($acc);
         |  if ($bArg < 0 || $m < $bMin ||
         |      (Double.isNaN($bMin) && !Double.isNaN($m))) {
         |    $bMin = $m; $bArg = $p;
         |  }
         |  if (($p + 1) % $bandBits == 0) {
         |    $sig ^= 1L << $bArg;
         |    $bMin = Double.NaN;
         |    $bArg = -1;
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Signed-random-projection signature: bit p of the result is the sign of
  * `v · planes(p)`. The plane matrix rides along as a referenced object, so
  * a 48×64 projection is one fused loop instead of a 3072-term expression
  * tree (which chokes the optimizer and Janino long before execution).
  */
case class SrpSignature(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_signature requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var acc = 0.0
      var i = 0
      val d = math.min(n, plane.length)
      while (i < d) { acc += v.getDouble(i) * plane(i); i += 1 }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val d = ctx.freshName("d")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $mat.length; $p++) {
         |  double $acc = 0.0;
         |  int $d = java.lang.Math.min($v.numElements(), $mat[$p].length);
         |  for (int $i = 0; $i < $d; $i++) {
         |    $acc += $v.getDouble($i) * $mat[$p][$i];
         |  }
         |  if ($acc >= 0) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cosine(a, b) = dot(a,b) / (‖a‖·‖b‖), all three sums in one fused loop. */
case class CosineSim(left: Expression, right: Expression)
    extends FusedVectorExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
