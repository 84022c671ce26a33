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

/** Bounded top-k buffer: parallel (count, key) arrays kept sorted by
  * (count DESC, key ASC), never more than k entries.
  */
final case class TopKBuf(ns: Seq[Long], keys: Seq[String])

/** `top_k_by_count(key, n, k)`: the k (key, n) pairs with the largest n
  * (ties by key ascending) — a typed [[Aggregator]] whose buffer is a
  * BOUNDED k-item sorted list, so the partial+final hash aggregate ships
  * only G·k entries per task across the shuffle. This replaces the
  * rank-window top-k idiom (`row_number() OVER (PARTITION BY g ORDER BY n
  * DESC)` + `rk <= k`), whose window input is the full aggregated table —
  * data-scale at 100 TB — sorted under a low-cardinality partition key
  * (a skew cliff: one task per group sorts that group's entire slice).
  * String ties compare with String.compareTo — identical to UTF8 binary
  * order on the BMP text this pipeline carries.
  */
final class TopKByCount(k: Int) extends Aggregator[(String, Long), TopKBuf, Seq[(String, Long)]] {

  override def zero: TopKBuf = TopKBuf(Nil, Nil)

  // (n1, k1) ranks strictly before (n2, k2)?
  private def before(n1: Long, k1: String, n2: Long, k2: String): Boolean =
    n1 > n2 || (n1 == n2 && k1.compareTo(k2) < 0)

  override def reduce(b: TopKBuf, in: (String, Long)): TopKBuf = {
    val (key, n) = in
    if (key == null) return b
    val size = b.ns.length
    if (size >= k && !before(n, key, b.ns(size - 1), b.keys(size - 1))) return b
    var pos = 0
    while (pos < size && before(b.ns(pos), b.keys(pos), n, key)) pos += 1
    val ns = (b.ns.take(pos) :+ n) ++ b.ns.drop(pos)
    val keys = (b.keys.take(pos) :+ key) ++ b.keys.drop(pos)
    TopKBuf(ns.take(k), keys.take(k))
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    if (b.ns.isEmpty) return a
    if (a.ns.isEmpty) return b
    val ns = scala.collection.mutable.ArrayBuffer.empty[Long]
    val keys = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var j = 0
    while (ns.length < k && (i < a.ns.length || j < b.ns.length)) {
      val takeA = j >= b.ns.length ||
        (i < a.ns.length && before(a.ns(i), a.keys(i), b.ns(j), b.keys(j)))
      if (takeA) { ns += a.ns(i); keys += a.keys(i); i += 1 }
      else { ns += b.ns(j); keys += b.keys(j); j += 1 }
    }
    TopKBuf(ns.toSeq, keys.toSeq)
  }

  override def finish(r: TopKBuf): Seq[(String, Long)] =
    r.keys.zip(r.ns)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

final case class KnnBuf(dists: Seq[Long], ids: Seq[Long])

/** `bottom_k_by_dist(id, dist, k)`: the k (id, dist) pairs with the
  * SMALLEST dist (ties by id ascending) — the KNN-join reducer. Same
  * bounded-buffer discipline as [[TopKByCount]]: each map task ships at
  * most Q·k entries per query group, so a batched nearest-neighbor join
  * over 100 TB of candidates never window-sorts the scored table under a
  * low-cardinality query key.
  */
final class BottomKByDist(k: Int)
  extends Aggregator[(Long, Long), KnnBuf, Seq[(Long, Long)]] {

  override def zero: KnnBuf = KnnBuf(Nil, Nil)

  private def before(d1: Long, i1: Long, d2: Long, i2: Long): Boolean =
    d1 < d2 || (d1 == d2 && i1 < i2)

  override def reduce(b: KnnBuf, in: (Long, Long)): KnnBuf = {
    val (id, d) = in
    val size = b.dists.length
    if (size >= k && !before(d, id, b.dists(size - 1), b.ids(size - 1))) return b
    var pos = 0
    while (pos < size && before(b.dists(pos), b.ids(pos), d, id)) pos += 1
    val ds = (b.dists.take(pos) :+ d) ++ b.dists.drop(pos)
    val ids = (b.ids.take(pos) :+ id) ++ b.ids.drop(pos)
    KnnBuf(ds.take(k), ids.take(k))
  }

  override def merge(a: KnnBuf, b: KnnBuf): KnnBuf = {
    if (b.dists.isEmpty) return a
    if (a.dists.isEmpty) return b
    val ds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    var j = 0
    while (ds.length < k && (i < a.dists.length || j < b.dists.length)) {
      val takeA = j >= b.dists.length ||
        (i < a.dists.length && before(a.dists(i), a.ids(i), b.dists(j), b.ids(j)))
      if (takeA) { ds += a.dists(i); ids += a.ids(i); i += 1 }
      else { ds += b.dists(j); ids += b.ids(j); j += 1 }
    }
    KnnBuf(ds.toSeq, ids.toSeq)
  }

  override def finish(r: KnnBuf): Seq[(Long, Long)] = r.ids.zip(r.dists)

  override def bufferEncoder: Encoder[KnnBuf] = Encoders.product[KnnBuf]
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
