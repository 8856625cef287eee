package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer et al., MOSS) as a native kernel.
  *
  * Same algorithm and constants as the l35 HOF rendering it replaces
  * (B = 257, P = 10⁹+7, k-gram polynomial hash, window-min with rightmost
  * ties): the composable HOF pipeline evaluates interpreted lambdas per
  * character and allocates three intermediate arrays per document —
  * measured 8.4 s over the sf0.1 corpus — where this kernel is one JIT'd
  * pass using the actual ROLLING identity h(p+1) = (h(p) − c(p)·Bᵏ⁻¹)·B +
  * c(p+k) mod P. Each fingerprint packs as `hash << 32 | pos` (hash < 2³⁰,
  * so 30+32 bits; positions beyond 2³² would need a 4-billion-char
  * document) and the query unpacks with bit ops, keeping the expression's
  * output a primitive long array.
  *
  * Dedup across overlapping windows relies on the selection index being
  * non-decreasing as the window slides (with rightmost tie-break the
  * elements left of the current pick hash strictly greater-or-tie, so a
  * slide can only keep or advance the pick) — comparing against the last
  * emitted index is therefore a complete distinct.
  */
object Winnow {
  final val B = 257L
  final val P = 1000000007L

  /** Packed (hash << 32 | 1-based pos) winnowing fingerprints of `text`. */
  def packed(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    // Code points, matching the oracle's ord(substr(text, p, 1)) and the
    // HOF rendering's per-character ascii() (identical on this corpus;
    // code points keep the two aligned beyond ASCII too).
    val cps = new Array[Int](s.length)
    var ncp = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(ncp) = cp; ncp += 1
      ci += Character.charCount(cp)
    }
    val nk = ncp - k + 1
    val nw = nk - w + 1
    if (nw < 1) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // Rolling k-gram hashes.
    var bk = 1L // B^(k-1) mod P
    var j = 1
    while (j < k) { bk = bk * B % P; j += 1 }
    val hs = new Array[Long](nk)
    var h = 0L
    j = 0
    while (j < k) { h = (h * B + cps(j)) % P; j += 1 }
    hs(0) = h
    var p = 1
    while (p < nk) {
      h = ((h - cps(p - 1) * bk % P + P) * B + cps(p + k - 1)) % P
      hs(p) = h
      p += 1
    }
    // Window-min selection, rightmost ties, dedup by last emitted index.
    val out = new Array[Long](nw)
    var cnt = 0
    var last = -1
    var st = 0
    while (st < nw) {
      var m = st
      var i = st + 1
      while (i < st + w) { if (hs(i) <= hs(m)) m = i; i += 1 }
      if (m != last) {
        out(cnt) = (hs(m) << 32) | (m + 1).toLong
        cnt += 1
        last = m
      }
      st += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }
}

/** `winnow_fps(text, k, w)` → array<bigint> of packed fingerprints. */
case class WinnowPacked(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    Winnow.packed(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Winnow.packed($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
