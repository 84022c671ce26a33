package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Product quantization (Jégou, Douze, Schmid 2011, "Product Quantization
  * for Nearest Neighbor Search") — the memory-scale path for ANN over an
  * embedding corpus that does not fit anywhere: each D-dim vector is split
  * into `m` subvectors, each quantized to its nearest of `ksub` per-subspace
  * centroids, leaving `m` BYTES per vector (a 100 TB float corpus becomes a
  * few TB of codes). A probe computes one m x ksub inner-product lookup
  * table from the query (driver-side, it is per-query metadata) and scans
  * the CODES with asymmetric distance computation (ADC): score = sum of m
  * table lookups — no float vectors touched until the exact re-rank of the
  * short candidate list.
  *
  * Both expressions are full codegen: encode compiles to the m x ksub x
  * subDim argmin loop, ADC to m array lookups — they run inside
  * whole-stage codegen next to the scan, no UDF, no boxing. The reference
  * delegates all such compute to the engine (reference:
  * src/catalog/mod.rs:359-361).
  */
object PqOps {

  /** Column API: PQ codes (array<tinyint>, length m) of an array<float>
    * embedding against a trained flat codebook (layout:
    * `codebook[(sub*ksub + cell)*subDim + d]`). Registered in
    * [[graft.GraftExtensions]] as `pq_encode`.
    */
  def pqEncode(vec: Column, codebook: Array[Float], m: Int, ksub: Int): Column =
    call_function("pq_encode", vec, lit(codebook), lit(m), lit(ksub))

  /** Column API: ADC score of a codes column against a per-query lookup
    * table (layout: `lut[sub*ksub + cell]` = inner product of the query's
    * sub-vector with that centroid). Registered as `pq_adc`.
    */
  def pqAdc(codes: Column, lut: Array[Float], ksub: Int): Column =
    call_function("pq_adc", codes, lit(lut), lit(ksub))

  /** Column API: squared L2 distance of two array<float> columns — the
    * k-means assignment metric. Registered as `l2_sq`.
    */
  def l2Sq(a: Column, b: Column): Column = call_function("l2_sq", a, b)

  /** The query-side ADC lookup table: inner product of each of the query's
    * m subvectors with each of its subspace's ksub centroids. m*ksub floats
    * — per-query planning metadata, computed on the driver like any ANN
    * library's query preprocessing.
    */
  def ipLut(query: Array[Float], codebook: Array[Float], m: Int, ksub: Int): Array[Float] = {
    val subDim = codebook.length / (m * ksub)
    require(query.length == m * subDim,
      s"pq lut: query dim ${query.length} != m*subDim ${m * subDim}")
    val lut = new Array[Float](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        var dot = 0f
        var d = 0
        while (d < subDim) {
          dot += query(s * subDim + d) * codebook((s * ksub + c) * subDim + d)
          d += 1
        }
        lut(s * ksub + c) = dot
        c += 1
      }
      s += 1
    }
    lut
  }
}

/** `pq_encode(embedding, codebook, m, ksub) -> array<tinyint>`: per-subspace
  * nearest-centroid codes (L2 in each subspace, the PQ training metric).
  * The codebook rides along as a broadcast-referenced constant inside the
  * generated code.
  */
final case class PqEncode(child: Expression, codebook: Array[Float], m: Int, ksub: Int)
  extends UnaryExpression {

  require(m > 0 && ksub > 0 && ksub <= 256, "pq_encode: need m>0, 0<ksub<=256")
  require(codebook.length % (m * ksub) == 0,
    s"pq_encode: codebook length ${codebook.length} not divisible by m*ksub=${m * ksub}")
  private val subDim = codebook.length / (m * ksub)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $dt")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == m * subDim,
      s"pq_encode: vector dim ${v.numElements()} != m*subDim ${m * subDim}")
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var dist = 0d
        var d = 0
        while (d < subDim) {
          // widen BEFORE subtracting — the codegen path subtracts in double,
          // and a float-precision diff here could flip an argmin tie between
          // the interpreted and compiled paths
          val diff = v.getFloat(s * subDim + d).toDouble -
            codebook((s * ksub + c) * subDim + d).toDouble
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      s"""
         |if ($v.numElements() != ${m * subDim}) throw new IllegalArgumentException(
         |  "pq_encode: vector dim " + $v.numElements() + " != ${m * subDim}");
         |byte[] $out = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestDist = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $dist = 0d;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      double $diff = (double) $v.getFloat($s * $subDim + $d)
         |        - (double) $cb[($s * $ksub + $c) * $subDim + $d];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
         |  }
         |  $out[$s] = (byte) $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `l2_sq(a, b) -> double`: squared euclidean distance of two float
  * arrays. The k-means assignment hot loop (PQ training scores every
  * subvector against every subspace centroid per Lloyd pass) — as an
  * interpreted higher-order `aggregate(zip_with(...))` this dominated
  * training time; as codegen it is one fused loop.
  */
final case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(dt: DataType) = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

/** `pq_adc(codes, lut, ksub) -> float`: asymmetric distance computation —
  * the approximate inner product of the (unseen) original vector with the
  * query, reconstructed as m lookup-table reads. The probe's hot loop over
  * the whole code table; full codegen.
  */
final case class PqAdc(child: Expression, lut: Array[Float], ksub: Int)
  extends UnaryExpression {

  require(ksub > 0 && lut.length % ksub == 0,
    s"pq_adc: lut length ${lut.length} not divisible by ksub=$ksub")
  private val m = lut.length / ksub

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<tinyint>, got $dt")
  }
  override def dataType: DataType = FloatType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    require(codes.numElements() == m, s"pq_adc: ${codes.numElements()} codes, expected $m")
    var sum = 0f
    var s = 0
    while (s < m) {
      sum += lut(s * ksub + (codes.getByte(s) & 0xff))
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "float[]")
    nullSafeCodeGen(ctx, ev, codes => {
      val sum = ctx.freshName("sum")
      val s = ctx.freshName("s")
      s"""
         |if ($codes.numElements() != $m) throw new IllegalArgumentException(
         |  "pq_adc: " + $codes.numElements() + " codes, expected $m");
         |float $sum = 0f;
         |for (int $s = 0; $s < $m; $s++) {
         |  $sum += $lutRef[$s * $ksub + ($codes.getByte($s) & 0xff)];
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}
