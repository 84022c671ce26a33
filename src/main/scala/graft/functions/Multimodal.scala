package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star "multimodal columns" operator):
  * treat image/audio/video payloads as opaque BINARY and run
  * decode/frame-sample as engine expressions.
  *
  * STUB NOTICE — no real codecs exist in this environment, so the "decode"
  * is a deterministic fake: `sample_frames` extracts `n` fixed-size byte
  * slices at evenly spaced offsets, which is the exact data-flow shape of
  * real frame sampling (seek to evenly spaced timestamps, decode one frame
  * each). Swapping the slice for an actual decoder changes ONLY the loop
  * body; the schema (binary -> array<binary>), the per-row batch shape,
  * and the partitioning behavior that the pipeline and tests pin stay
  * identical.
  */
object Multimodal {
  def sampleFrames(payload: Column, frameBytes: Int, n: Int): Column =
    call_function("sample_frames", payload, lit(frameBytes), lit(n))
}

/** `sample_frames(payload, frameBytes, n) -> array<binary>`: n evenly
  * spaced frameBytes-sized slices of the payload (shorter tail slices kept;
  * empty payload -> empty array). Full codegen via a shared static-shaped
  * helper — one call per row, no UDF serialization.
  */
final case class SampleFrames(child: Expression, frameBytes: Int, n: Int)
  extends UnaryExpression {

  require(frameBytes > 0 && n > 0, "sample_frames: frameBytes>0, n>0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $dt")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "sample_frames"

  override def nullSafeEval(input: Any): Any =
    SampleFrames.compute(input.asInstanceOf[Array[Byte]], frameBytes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.SampleFrames$$.MODULE$$.compute($b, $frameBytes, $n);")

  override protected def withNewChildInternal(newChild: Expression): SampleFrames =
    copy(child = newChild)
}

object SampleFrames {
  /** Shared by interpreted and generated code — identical by construction. */
  def compute(payload: Array[Byte], frameBytes: Int, n: Int): GenericArrayData = {
    if (payload.isEmpty) return new GenericArrayData(Array.empty[Any])
    val frames = new Array[Any](math.min(n, math.max(1, payload.length / math.max(frameBytes, 1))))
    val count = frames.length
    var i = 0
    while (i < count) {
      // evenly spaced offsets across the payload ("seek to timestamp i/n")
      val off = ((payload.length - math.min(frameBytes, payload.length)).toLong * i /
        math.max(count - 1, 1)).toInt
      val len = math.min(frameBytes, payload.length - off)
      frames(i) = java.util.Arrays.copyOfRange(payload, off, off + len)
      i += 1
    }
    new GenericArrayData(frames)
  }
}
