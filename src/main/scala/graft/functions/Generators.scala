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

/** `explode_pairs(ids)`: all ordered pairs (a < b by position) of a sorted
  * array<long> — the candidate-pair expansion of LSH bucket dedup. A
  * Generator with a tight compiled loop: one eval per BUCKET, not one
  * interpreted Catalyst lambda per pair — on hot buckets (shared-vocab
  * corpora) the interpreted `transform(slice(...))` chain it replaces
  * dominated the whole dedup job.
  */
final case class ExplodePairs(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<long>, got $dt")
  }
  override def elementSchema: StructType = new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)
  override def prettyName: String = "explode_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) return Nil
    val ids = arr.toLongArray()
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < ids.length - 1
      override def next(): InternalRow = {
        val r = InternalRow(ids(i), ids(j))
        j += 1
        if (j >= ids.length) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodePairs =
    copy(child = newChild)
}

/** `explode_hamming_pairs(ids, hashes, maxHamming)`: pairs (by position,
  * a < b) of a bucket's doc ids whose 64-bit fingerprints are within
  * `maxHamming` — the SimHash near-dup pair expansion with the hamming cut
  * fused into the compiled loop, so hot buckets never materialize
  * non-matching pairs anywhere.
  */
final case class ExplodeHammingPairs(ids: Expression, hashes: Expression, maxHamming: Int)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(ids, hashes)
  override def checkInputDataTypes(): TypeCheckResult =
    (ids.dataType, hashes.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<long>, array<long>), got ($a, $b)")
    }
  override def elementSchema: StructType = new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)
    .add("hamming", IntegerType, nullable = false)
  override def prettyName: String = "explode_hamming_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val ia = ids.eval(input).asInstanceOf[ArrayData]
    val ha = hashes.eval(input).asInstanceOf[ArrayData]
    if (ia == null || ha == null || ia.numElements() < 2) return Nil
    val n = math.min(ia.numElements(), ha.numElements())
    val id = ia.toLongArray()
    val h = ha.toLongArray()
    val out = Seq.newBuilder[InternalRow]
    var i = 0
    while (i < n - 1) {
      var j = i + 1
      while (j < n) {
        val d = java.lang.Long.bitCount(h(i) ^ h(j))
        if (d <= maxHamming) out += InternalRow(id(i), id(j), d)
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExplodeHammingPairs =
    copy(ids = newChildren(0), hashes = newChildren(1))
}
