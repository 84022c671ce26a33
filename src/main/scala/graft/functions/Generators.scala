package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `explode_ngrams(tokens, n)`: one output row per word n-gram of an
  * array<string> — the UDTF (table-generating) extension surface
  * (SURVEY §2b "UDF/UDAF/UDTF" row), exercised by the text-analysis
  * pipeline (q42). A [[Generator]] runs inside Spark's GenerateExec — rows
  * stream out lazily per input row, so memory is O(n-gram), never
  * O(corpus); the n-gram string is built directly from UTF8String slices
  * (no JVM String round-trip).
  */
final case class ExplodeNgrams(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "explode_ngrams: n >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $dt")
  }

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)
  override def prettyName: String = "explode_ngrams"

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) return Nil
    val toks = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < toks.length) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    (0 to toks.length - n).iterator.map { s =>
      InternalRow(UTF8String.concatWs(space, java.util.Arrays.copyOfRange(toks, s, s + n): _*))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeNgrams =
    copy(child = newChild)
}
