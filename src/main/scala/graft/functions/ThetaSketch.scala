package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches — mergeable distinct-count sketches CLOSED UNDER SET
  * ALGEBRA (union / intersection / difference), unlike HLL which only
  * unions:
  *
  *   theta_build(value[, lgK]) — aggregate → serialized CompactSketch
  *
  * The core currency for cross-corpus composition questions — "how much
  * does source A's vocabulary overlap source B's?", "how many NEW
  * documents does this crawl add?" — where the exact answer needs a
  * full-cardinality shuffle per PAIR of corpora, but sketches make every
  * pairwise estimate a driver-side set operation over per-corpus
  * fixed-size summaries built in ONE pass each. A theta sketch is exact
  * until it exceeds its nominal entry count (lgK), then becomes a ~1%
  * estimator; both modes are deterministic (fixed seed, order-independent
  * KMV), so results are stable across runs and partitionings.
  *
  * Implementation is Apache DataSketches theta. Engine-surface addition
  * (the reference delegates all compute, reference:
  * src/catalog/mod.rs:359-361).
  */
object ThetaOps {
  private def wrap(bytes: Array[Byte]) = Sketches.wrapSketch(Memory.wrap(bytes))

  /** Distinct-count estimate (exact while the sketch is in exact mode). */
  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  /** |A ∩ B| estimate via theta intersection. */
  def intersect(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a))
    i.intersect(wrap(b))
    i.getResult.getEstimate
  }

  /** |A ∪ B| estimate via theta union. */
  def unionEst(a: Array[Byte], b: Array[Byte]): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(wrap(a))
    u.union(wrap(b))
    u.getResult.getEstimate
  }

  /** True while the sketch has seen fewer distincts than its nominal
    * capacity — estimates are exact counts in this mode.
    */
  def isExact(bytes: Array[Byte]): Boolean = !wrap(bytes).isEstimationMode
}

/** `theta_build(valueExpr, lgK)`: TypedImperativeAggregate producing a
  * serialized compact theta sketch of the distinct input values (STRING or
  * LONG). Partial sketches per task, merged by theta union at the final
  * stage — one bounded-size sketch per partition crosses the shuffle.
  */
final case class ThetaBuildAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_build"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_build expects STRING or LONG input, got ${other.sql}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case _ => buffer.update(v.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaBuildAgg =
    copy(child = newChild)
}
