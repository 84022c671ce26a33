package graft.functions

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Frequent-items (heavy hitters) sketching — the bounded-memory path to
  * EXACT top-frequency answers over unbounded key cardinality:
  *
  *   freq_build(hash[, maxMapSize]) — aggregate → serialized LongsSketch
  *
  * The sketch is Misra-Gries/Space-Saving (Apache DataSketches
  * `LongsSketch`): with map size M over n updates, every item with true
  * frequency > n/M is guaranteed retained, and `NO_FALSE_NEGATIVES`
  * extraction returns a SUPERSET of every item meeting a threshold above
  * that error bound. Pair it with an exact second pass — count ONLY the
  * candidate items (a broadcast-sized set) and apply the real threshold —
  * and the final answer is exact, with the full-cardinality shuffle
  * replaced by: fixed-size sketches per task → one merge → a pre-shuffle
  * candidate filter. At 100 TB this is the difference between shuffling
  * every (term, 1) pair and shuffling only terms that might be heavy.
  *
  * Operates on 64-bit pre-hashes (pair with `xxhash64`) so the sketch
  * never stores strings; hash collisions can only ADD candidates, which
  * the exact pass discards. Engine-surface addition (the reference
  * delegates all compute, reference: src/catalog/mod.rs:359-361).
  */
object FreqSketch {
  /** Candidate items whose frequency MIGHT meet `threshold` — guaranteed a
    * superset of all items with true frequency >= threshold provided
    * threshold exceeds the sketch's maximum error (caller must check
    * [[maxError]]).
    */
  def candidates(bytes: Array[Byte], threshold: Long): Array[Long] =
    LongsSketch.getInstance(Memory.wrap(bytes))
      .getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem)

  /** The sketch's maximum estimation error: any item with true frequency
    * above this is guaranteed present. A threshold must exceed this for
    * the superset guarantee to hold — size maxMapSize > n/threshold.
    */
  def maxError(bytes: Array[Byte]): Long =
    LongsSketch.getInstance(Memory.wrap(bytes)).getMaximumError
}

/** `freq_build(hashExpr, maxMapSize)`: TypedImperativeAggregate producing a
  * serialized frequent-items sketch over the input 64-bit hashes. Partial
  * sketches per task, merged at the final stage — the shuffle carries one
  * bounded-size sketch per partition, never the input rows.
  */
final case class FreqBuildAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with UnaryLike[Expression] {

  override def prettyName: String = "freq_build"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_build expects a LONG hash input (pair with xxhash64), got ${child.dataType.sql}")

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqBuildAgg =
    copy(child = newChild)
}
