package graft

import org.apache.spark.sql.functions.{col, expr, xxhash64}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FreqSketch, ThetaOps}

/** freq_build (Misra-Gries heavy hitters) and theta_build (distinct-count
  * set algebra) — the two sketch aggregates behind q95/q96. Pins the
  * guarantees the exact answers rest on: the frequent-items superset
  * property (no false negatives above the error bound), exactness of the
  * theta estimates below nominal capacity, merge correctness under
  * repartitioning, and determinism across runs.
  */
class SketchSuiteSpec extends AnyFunSuite {
  import TestSpark._

  // ───── freq_build ─────────────────────────────────────────────────────

  test("freq_build: candidate extraction is a superset of all true heavy hitters") {
    import spark.implicits._
    // skewed synthetic stream: item i appears (1000 - i) times for i<100,
    // plus 50k singleton tail items
    val df = ((0 until 100).flatMap(i => Seq.fill(1000 - i)(i.toLong)) ++
      (100000L until 150000L)).toDF("v").repartition(16)
    val sk = df.agg(expr("freq_build(xxhash64(v), 1024)")).head().getAs[Array[Byte]](0)
    val T = 500L
    assert(T > FreqSketch.maxError(sk), s"error bound ${FreqSketch.maxError(sk)}")
    val cands = FreqSketch.candidates(sk, T).toSet
    // every item with true frequency >= T must be present
    val trueHeavy = (0 until 100).filter(i => 1000 - i >= T).map(_.toLong)
    val missing = trueHeavy.filterNot(v =>
      cands.contains(org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, org.apache.spark.sql.types.LongType, 42L)))
    assert(missing.isEmpty, s"missing true heavy hitters: $missing")
  }

  test("freq_build: merge across partitionings is consistent (exact when map fits)") {
    import spark.implicits._
    val data = (0 until 500).flatMap(i => Seq.fill(i % 7 + 1)(i.toLong))
    // map larger than distinct count -> exact counts regardless of split
    val a = data.toDF("v").repartition(1)
      .agg(expr("freq_build(xxhash64(v), 2048)")).head().getAs[Array[Byte]](0)
    val b = data.toDF("v").repartition(32)
      .agg(expr("freq_build(xxhash64(v), 2048)")).head().getAs[Array[Byte]](0)
    assert(FreqSketch.maxError(a) === 0L)
    assert(FreqSketch.maxError(b) === 0L)
    assert(FreqSketch.candidates(a, 7L).toSet === FreqSketch.candidates(b, 7L).toSet)
  }

  test("freq_build: two-pass exact heavy hitters equal the full group-by") {
    import spark.implicits._
    val data = (0 until 2000).map(i => (i % 50).toLong)
    val df = data.toDF("v").repartition(8)
    val sk = df.agg(expr("freq_build(xxhash64(v), 4096)")).head().getAs[Array[Byte]](0)
    val T = 40L
    val cands = FreqSketch.candidates(sk, T)
    val twoPass = df.filter(xxhash64(col("v")).isInCollection(cands))
      .groupBy("v").count().filter(col("count") >= T)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("v").count().filter(col("count") >= T)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPass === exact)
  }

  // ───── theta_build ────────────────────────────────────────────────────

  test("theta_build: exact-mode estimates are exact distinct counts") {
    import spark.implicits._
    val df = (0 until 10000).map(i => s"item-${i % 3000}").toDF("s").repartition(16)
    val sk = df.agg(expr("theta_build(s, 16)")).head().getAs[Array[Byte]](0)
    assert(ThetaOps.isExact(sk))
    assert(Math.round(ThetaOps.estimate(sk)) === 3000L)
  }

  test("theta_build: intersection and union match exact set algebra in exact mode") {
    import spark.implicits._
    val a = (0 until 2000).map(i => s"k$i").toDF("s")
      .agg(expr("theta_build(s, 16)")).head().getAs[Array[Byte]](0)
    val b = (1500 until 4000).map(i => s"k$i").toDF("s")
      .agg(expr("theta_build(s, 16)")).head().getAs[Array[Byte]](0)
    assert(Math.round(ThetaOps.intersect(a, b)) === 500L)
    assert(Math.round(ThetaOps.unionEst(a, b)) === 4000L)
  }

  test("theta_build: deterministic across partitionings (order-independent KMV)") {
    import spark.implicits._
    val data = (0 until 5000).map(i => s"v$i")
    val a = data.toDF("s").repartition(1)
      .agg(expr("theta_build(s, 12)")).head().getAs[Array[Byte]](0)
    val b = data.reverse.toDF("s").repartition(32)
      .agg(expr("theta_build(s, 12)")).head().getAs[Array[Byte]](0)
    // same value set -> identical estimate even in estimation mode
    assert(ThetaOps.estimate(a) === ThetaOps.estimate(b))
  }

  test("theta_build: estimation mode stays within ~3 sigma relative error") {
    import spark.implicits._
    val n = 200000
    val df = (0 until n).map(i => s"u$i").toDF("s").repartition(16)
    val sk = df.agg(expr("theta_build(s, 12)")).head().getAs[Array[Byte]](0)
    assert(!ThetaOps.isExact(sk))
    val est = ThetaOps.estimate(sk)
    // lgK=12 -> RSE ~ 1/sqrt(2^12) ~ 1.6%; allow 3x
    assert(math.abs(est - n) / n < 0.05, s"estimate $est vs $n")
  }

  test("theta_build: long input type works (hashes, ids)") {
    val sk = spark.range(0, 1234)
      .agg(expr("theta_build(id, 16)")).head().getAs[Array[Byte]](0)
    assert(Math.round(ThetaOps.estimate(sk)) === 1234L)
  }
}
