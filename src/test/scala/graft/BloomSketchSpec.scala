package graft

import org.apache.spark.sql.functions.{col, expr, xxhash64}
import org.scalatest.funsuite.AnyFunSuite

/** bloom_build / bloom_probe: the runtime sketch-filter pair (q91's
  * engine surface). Pins the two properties exactness depends on — zero
  * false negatives, bounded false positives — plus codegen execution and
  * distributed (multi-partition, partial+merge) sketch construction.
  */
class BloomSketchSpec extends AnyFunSuite {
  import TestSpark._

  test("no false negatives: every inserted hash probes true (distributed build)") {
    val sketch = spark.range(0, 10000).repartition(8)
      .agg(expr("bloom_build(xxhash64(id), 10000)")).head().getAs[Array[Byte]](0)
    val missed = spark.range(0, 10000)
      .filter(!expr(s"bloom_probe(unhex('${sketch.map("%02x".format(_)).mkString}'), xxhash64(id))"))
      .count()
    assert(missed === 0L)
  }

  test("false-positive rate stays near the configured fpp") {
    val sketch = spark.range(0, 10000)
      .agg(expr("bloom_build(xxhash64(id), 10000, 0.01d)")).head().getAs[Array[Byte]](0)
    val hex = sketch.map("%02x".format(_)).mkString
    // disjoint probe population: ids far outside the inserted range
    val fp = spark.range(1000000, 1100000)
      .filter(expr(s"bloom_probe(unhex('$hex'), xxhash64(id))")).count()
    assert(fp < 5000L, s"fpp ${fp / 100000.0} far above configured 0.01")
  }

  test("probe runs inside whole-stage codegen") {
    val sketch = spark.range(0, 100)
      .agg(expr("bloom_build(xxhash64(id), 100)")).head().getAs[Array[Byte]](0)
    val hex = sketch.map("%02x".format(_)).mkString
    val df = spark.range(0, 1000).filter(expr(s"bloom_probe(unhex('$hex'), xxhash64(id))"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter bloom_probe"), plan) // * = inside WholeStageCodegen
    assert(df.count() >= 100L) // all inserted + possible fps
  }

  test("null hash probes to null, so the row is filtered") {
    val sketch = spark.range(0, 10)
      .agg(expr("bloom_build(xxhash64(id), 10)")).head().getAs[Array[Byte]](0)
    val hex = sketch.map("%02x".format(_)).mkString
    import spark.implicits._
    val rows = Seq(Some(1L), None).toDF("v")
      .filter(expr(s"bloom_probe(unhex('$hex'), if(v IS NULL, NULL, xxhash64(v)))"))
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
  }
}
