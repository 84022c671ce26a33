package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Signed-random-projection LSH over embedding vectors — the scale path for
  * similarity search and embedding-cosine near-dup (SURVEY §2b "similarity
  * search"; north-star LLM-pipeline operator). Public-knowledge scheme
  * (Charikar '02 SRP-LSH): bit i of a signature is the sign of the dot
  * product with a fixed pseudo-random hyperplane; two vectors agree on a
  * bit with probability 1 - angle/pi. Bits are grouped into bands — vectors
  * colliding on any band become candidates, so candidate generation is a
  * bucketed shuffle on (band, value), NEVER an all-pairs join.
  */
object VectorHashing {

  /** Rademacher (+1/-1) hyperplane entries, seeded by SplitMix64 —
    * deterministic across JVMs, sessions and executors. Packed as one bit
    * per (hyperplane, dim): 1 = +1, 0 = -1.
    */
  private[functions] def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Long] = {
    var x = seed
    def next(): Long = { // SplitMix64, same family as TextHashing.families
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val words = (bits * dim + 63) / 64
    Array.fill(words)(next())
  }

  /** Column API: SRP band values for an array<float> embedding.
    * Returns array<int> of length numBands; element b packs bitsPerBand sign
    * bits. Registered in [[graft.GraftExtensions]] as `srp_bands`.
    */
  def srpBands(vec: Column, numBands: Int, bitsPerBand: Int, seed: Long = 7L): Column =
    call_function("srp_bands", vec, lit(numBands), lit(bitsPerBand), lit(seed))

  /** Per-dim bit stride of the packed plane pool (upper bound on supported
    * vector dimensionality; [[SrpBands]] sizes its pool with it).
    */
  final val MaxDim = 4096

  /** Hyperplane h's sign mask restricted to dims 0..63, as ONE 64-bit word:
    * the pool's bit stride per hyperplane is MaxDim = 4096 (64-aligned), so
    * bits (h·4096 .. h·4096+63) are exactly word h·64. This is what lets a
    * SQL oracle replay the banding — for dim ≤ 64 embeddings each
    * hyperplane is a single BIGINT literal and `(mask >> d) & 1` recovers
    * the sign, bit-identical to [[SrpBands]] by construction (same
    * SplitMix64 pool, same indexing).
    */
  def planeMasks64(numPlanes: Int, seed: Long = 7L): Array[Long] = {
    val pool = hyperplanes(numPlanes, MaxDim, seed)
    Array.tabulate(numPlanes)(h => pool(h * (MaxDim / 64)))
  }
}

/** `srp_bands(embedding, numBands, bitsPerBand, seed) -> array<int>`: band
  * values of the SRP-LSH signature. Full codegen — the dims x bits loop
  * compiles into whole-stage codegen next to the parquet scan, no UDF, no
  * boxing. Hyperplane dimensionality adapts to the input vector length (the
  * packed bit pool is sized for `maxDim`; longer vectors fail fast).
  */
final case class SrpBands(child: Expression, numBands: Int, bitsPerBand: Int, seed: Long)
  extends UnaryExpression {

  require(numBands > 0 && bitsPerBand > 0 && bitsPerBand <= 31,
    "srp_bands: need numBands>0, 0<bitsPerBand<=31")

  /** Upper bound on supported vector dimensionality; the plane pool is
    * allocated once for this bound so the same expression serves any
    * embedding column <= maxDim wide.
    */
  private val maxDim = VectorHashing.MaxDim
  private lazy val planes: Array[Long] =
    VectorHashing.hyperplanes(numBands * bitsPerBand, maxDim, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $dt")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_bands"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    require(dim <= maxDim, s"srp_bands supports dim<=$maxDim, got $dim")
    val out = new Array[Int](numBands)
    var b = 0
    while (b < numBands) {
      var band = 0
      var i = 0
      while (i < bitsPerBand) {
        val h = b * bitsPerBand + i // hyperplane index
        var dot = 0d
        var d = 0
        while (d < dim) {
          val bit = h.toLong * maxDim + d
          val sign = (planes((bit >>> 6).toInt) >>> (bit & 63)) & 1L
          val x = v.getFloat(d).toDouble
          dot += (if (sign == 1L) x else -x)
          d += 1
        }
        if (dot > 0) band |= (1 << i)
        i += 1
      }
      out(b) = band
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val dim = ctx.freshName("dim")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val dot = ctx.freshName("dot")
      val band = ctx.freshName("band")
      val bit = ctx.freshName("bit")
      val x = ctx.freshName("x")
      s"""
         |int $dim = $v.numElements();
         |if ($dim > $maxDim) throw new IllegalArgumentException(
         |  "srp_bands supports dim<=$maxDim, got " + $dim);
         |int[] $out = new int[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  int $band = 0;
         |  for (int $i = 0; $i < $bitsPerBand; $i++) {
         |    int $h = $b * $bitsPerBand + $i;
         |    double $dot = 0d;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      long $bit = ((long) $h) * ${maxDim}L + $d;
         |      double $x = (double) $v.getFloat($d);
         |      $dot += ((($planesRef[(int)($bit >>> 6)] >>> ($bit & 63L)) & 1L) == 1L) ? $x : -$x;
         |    }
         |    if ($dot > 0) $band |= (1 << $i);
         |  }
         |  $out[$b] = $band;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}
