package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken '03, the
  * MOSS algorithm — public knowledge): hash every k-byte window with a
  * polynomial ROLLING hash (O(1) per position), then keep the rightmost
  * minimum of every w consecutive hashes. Guarantees: any shared substring
  * of length >= k + w - 1 contributes at least one shared fingerprint, and
  * the density of selected prints is ~2/(w+1) — a compact, alignment-robust
  * signature for copy detection over 100 TB of text (compare documents by
  * joining on fingerprint values — a bucketed shuffle, never all-pairs).
  */
object Winnowing {

  /** Column API (SQL name: winnow_fingerprints). */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    call_function("winnow_fingerprints", text, lit(k), lit(w))

  private final val B = 1000003L // polynomial base (odd, > any byte)

  /** Shared by interpreted eval AND generated code (the codegen emits one
    * static-shaped call) — bit-identical by construction.
    */
  def compute(s: UTF8String, k: Int, w: Int): UnsafeArrayData = {
    val n = s.numBytes()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * B + (s.getByte(i) & 0xffL); i += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(h))
    }
    val m = n - k + 1
    val hs = new Array[Long](m)
    var pow = 1L // B^(k-1)
    var j = 1
    while (j < k) { pow *= B; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (s.getByte(i) & 0xffL); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - (s.getByte(i - 1) & 0xffL) * pow) * B + (s.getByte(i + k - 1) & 0xffL)
      hs(i) = h
      i += 1
    }
    if (m <= w) {
      // single window: global rightmost min
      var best = 0
      var p = 1
      while (p < m) { if (hs(p) <= hs(best)) best = p; p += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(hs(best)))
    }
    val out = new Array[Long](m) // at most one print per position
    var cnt = 0
    var last = -1 // index of the last selected print
    var start = 0
    while (start <= m - w) {
      var best = start
      var p = start + 1
      while (p < start + w) { if (hs(p) <= hs(best)) best = p; p += 1 }
      if (best != last) { out(cnt) = hs(best); cnt += 1; last = best }
      start += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }
}

/** `winnow_fingerprints(text, k, w) -> array<long>` as a codegen Catalyst
  * expression: the generated code calls the same [[Winnowing.compute]] the
  * interpreter uses (one virtual call per ROW; the per-byte rolling-hash
  * loop is inside), so the expression stays inside whole-stage codegen with
  * no UDF/serialization overhead.
  */
final case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 2 && w >= 1, "winnow_fingerprints: need k>=2, w>=1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    Winnowing.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Winnowing$$.MODULE$$.compute($s, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
