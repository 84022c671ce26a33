package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `phash64(payload) -> bigint` — the classic DCT perceptual hash over an
  * image payload (NULL for undecodable bytes), the content-based identity
  * every image-dedup pipeline keys on:
  *
  *   decode → 32×32 box-filtered luma (shared with `decode_image`) →
  *   orthonormal 2-D DCT-II → the 8×8 lowest-frequency block minus the DC
  *   term (63 coefficients) → median threshold → 64-bit hash.
  *
  * Properties that make it the right key at 100 TB: brightness shifts land
  * almost entirely in the dropped DC term, re-encodes and small pixel
  * edits perturb only high frequencies outside the kept block, so
  * near-identical images agree on most bits and hamming distance is the
  * dedup metric — pair with 8×8-bit banded bucketing for a candidate join
  * that is LOSSLESS for hamming ≤ 7 (pigeonhole: 8 bit-errors can't dirty
  * all 8 bands... 7 can't). All trig comes from StrictMath and the box
  * filter avoids Graphics2D, so hashes are bit-identical across JVMs —
  * safe to persist and join across clusters.
  *
  * Engine-surface addition (the reference delegates all compute,
  * reference: src/catalog/mod.rs:359-361).
  */
final case class PHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $dt")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "phash64"

  override def nullSafeEval(input: Any): Any =
    PHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${c.isNull}) {
          java.lang.Long r = (java.lang.Long) graft.functions.PHash64$$.MODULE$$.compute(${c.value});
          if (r != null) { ${ev.isNull} = false; ${ev.value} = r.longValue(); }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

object PHash64 {
  private final val N = 32 // luma grid; DCT input size

  // cos(u)(x) = cos((2x+1)·u·π / 2N), StrictMath for cross-JVM determinism;
  // only the 8 lowest frequencies are ever read back
  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, N)((u, x) => StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * N)))
  private val a0 = StrictMath.sqrt(1.0 / N)
  private val aU = StrictMath.sqrt(2.0 / N)

  /** 64-bit DCT perceptual hash, or null when the payload isn't an image. */
  def compute(payload: Array[Byte]): java.lang.Long = {
    val decoded = DecodeImage.decodeGray(payload, N)
    if (decoded == null) return null
    val gray = decoded._4
    // separable DCT, low 8 frequencies only: rows first (N×8), then columns
    val tmp = new Array[Double](N * 8)
    var y = 0
    while (y < N) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < N) { s += gray(y * N + x) * cosT(v)(x); x += 1 }
        tmp(y * 8 + v) = s
        v += 1
      }
      y += 1
    }
    val d = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val au = if (u == 0) a0 else aU
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < N) { s += tmp(yy * 8 + v) * cosT(u)(yy); yy += 1 }
        d(u * 8 + v) = s * au * (if (v == 0) a0 else aU)
        v += 1
      }
      u += 1
    }
    // 63 AC coefficients; bit i set iff ac(i) strictly above the median
    val ac = java.util.Arrays.copyOfRange(d, 1, 64)
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var bits = 0L
    var i = 0
    while (i < 63) {
      if (ac(i) > med) bits |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(bits)
  }
}
