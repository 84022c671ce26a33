package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-sketch runtime filtering — the "sideways information passing"
  * pattern (Spark's own runtime row-level filters, Iceberg/parquet bloom
  * pushdown) surfaced as first-class engine functions:
  *
  *   bloom_build(hash[, expectedItems[, fpp]])  — aggregate → binary sketch
  *   bloom_probe(sketch, hash)                  — codegen membership probe
  *
  * Why it matters at 100 TB: a decontamination / semi-join whose build side
  * is too big to broadcast as ROWS (a billion benchmark n-grams at 13
  * tokens) still fits as a SKETCH (~1.2 GB at 1% fpp — 100× smaller than
  * the gram set). Build once over the small side, probe the 100 TB side
  * BEFORE its shuffle: ~99% of probe rows die at the scan, and the exact
  * join that follows only shuffles the survivors. False positives cost a
  * wasted shuffle row (the exact join removes them — results stay exact);
  * false negatives are impossible, so nothing is ever lost.
  *
  * Both sides operate on 64-bit pre-hashes (pair with `xxhash64`), so the
  * sketch never stores strings and the probe is a pure long→bits lookup
  * inside whole-stage codegen. Engine-surface addition (the reference
  * delegates all compute, reference: src/catalog/mod.rs:359-361); sketch
  * implementation is Spark's public `org.apache.spark.util.sketch`.
  */
object BloomSketch {
  private[functions] def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}

/** `bloom_build(hashExpr, expectedItems, fpp)`: TypedImperativeAggregate
  * producing a serialized BloomFilter over the input 64-bit hashes.
  * Partial-aggregates per task (putLong into a local sketch), merges
  * sketches at the final stage — the shuffle carries one fixed-size sketch
  * per partition, never the input rows.
  */
final case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def prettyName: String = "bloom_build"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build expects a LONG hash input (pair with xxhash64), got ${child.dataType.sql}")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter =
    buffer.mergeInPlace(other)

  override def eval(buffer: BloomFilter): Any = BloomSketch.serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = BloomSketch.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): BloomFilter = BloomFilter.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** `bloom_probe(sketchExpr, hashExpr)`: membership test against a sketch
  * that must be a runtime CONSTANT (a binary literal or scalar-subquery
  * result — the same contract as Spark's internal might_contain). The
  * sketch deserializes ONCE per executor via the codegen reference-object
  * table; the generated per-row code is a single `mightContainLong` call,
  * fully inside whole-stage codegen.
  */
final case class BloomProbe(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] {

  override def prettyName: String = "bloom_probe"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_probe sketch must be BINARY, got ${left.dataType.sql}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_probe hash must be LONG (pair with xxhash64), got ${right.dataType.sql}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_probe sketch must be a constant (literal or scalar subquery)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val sketch: BloomFilter = {
    val bytes = left.eval(null)
    if (bytes == null) null else BloomFilter.readFrom(bytes.asInstanceOf[Array[Byte]])
  }

  override def eval(input: InternalRow): Any = {
    if (sketch == null) return null
    val v = right.eval(input)
    if (v == null) null else sketch.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (sketch == null) {
      ev.copy(code = code"""boolean ${ev.isNull} = true;
        |boolean ${ev.value} = false;""".stripMargin)
    } else {
      val bf = ctx.addReferenceObj("bloomSketch", sketch, classOf[BloomFilter].getName)
      val h = right.genCode(ctx)
      ev.copy(code = code"""${h.code}
        |boolean ${ev.isNull} = ${h.isNull};
        |boolean ${ev.value} = false;
        |if (!${ev.isNull}) { ${ev.value} = $bf.mightContainLong(${h.value}); }
        |""".stripMargin)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}
