package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Partial-aggregation buffer for element-wise vector sums. */
final case class VecBuf(sums: Array[Double], n: Long)

/** Element-wise mean of `array<float>` embeddings — the UDAF extension
  * surface (SURVEY §2b "UDF/UDAF/UDTF" row) exercised on a real
  * LLM-pipeline need: per-label centroids for IVF-style partitioning /
  * cluster summaries. A typed [[Aggregator]] compiles to a partial+final
  * hash aggregate: each partition folds its vectors into one (sums, n)
  * buffer and only buffers cross the shuffle — bytes moved per partition
  * are O(dim), independent of row count, the same shape that holds at
  * 100 TB.
  */
object VectorAvg extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {

  override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecBuf, v: Seq[Float]): VecBuf = {
    if (v == null) return b
    val s = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
    var i = 0
    val m = math.min(s.length, v.length)
    while (i < m) { s(i) += v(i); i += 1 }
    VecBuf(s, b.n + 1)
  }

  override def merge(a: VecBuf, b: VecBuf): VecBuf = {
    if (a.sums.isEmpty) return b
    if (b.sums.isEmpty) return a
    val s = a.sums.clone()
    var i = 0
    val m = math.min(s.length, b.sums.length)
    while (i < m) { s(i) += b.sums(i); i += 1 }
    VecBuf(s, a.n + b.n)
  }

  override def finish(r: VecBuf): Seq[Double] =
    if (r.n == 0) null else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
