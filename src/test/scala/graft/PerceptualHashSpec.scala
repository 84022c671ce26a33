package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Multimodal, PHash64}

/** phash64 — DCT perceptual hash: invariance (brightness/noise),
  * separation (different content), NULL-safety, codegen parity.
  */
class PerceptualHashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def h(bytes: Array[Byte]): Long = {
    val r = PHash64.compute(bytes)
    assert(r != null, "fixture must decode")
    r.longValue()
  }

  test("exact duplicate bytes hash identically") {
    val img = Multimodal.syntheticPng(3)
    assert(h(img) == h(img.clone()))
  }

  test("brightness shift + pixel noise stays within hamming 7 (the lossless band cut)") {
    for (seed <- 0 until 12) {
      val base = h(Multimodal.syntheticPng(seed))
      val near = h(Multimodal.syntheticPng(seed, brightness = 6, noisePixels = 12))
      val d = ham(base, near)
      info(s"seed $seed: near-dup hamming $d")
      assert(d <= 7, s"seed $seed: near-dup drifted to hamming $d")
    }
  }

  test("different content separates far beyond the near-dup cut") {
    val hs = (0 until 12).map(s => h(Multimodal.syntheticPng(s)))
    for (i <- hs.indices; j <- hs.indices if i < j) {
      val d = ham(hs(i), hs(j))
      info(s"seeds $i/$j: hamming $d")
      assert(d > 7, s"distinct seeds $i/$j collide at hamming $d")
    }
  }

  test("non-image payloads are NULL; hash is stable through the SQL surface") {
    val img = Multimodal.syntheticPng(5)
    val rows = Seq((1L, img), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"), expr("phash64(payload)").as("ph"))
      .orderBy("id").collect()
    assert(rows(0).getLong(1) == h(img))
    assert(rows(1).isNullAt(1))
  }

  test("q92 finds exactly the planted near-dup pairs (banded join is lossless at hamming <= 7)") {
    val rows = SparkEntry.queries("q92_image_phash_neardup")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (0 until 6).map(i => (i.toLong, 100L + i)) :+ (6L, 106L)
    assert(rows.toSeq == expected)
  }

  test("oracle literal table == real decode (r11: q92's fixed-literal oracle)") {
    // q92's DuckDB oracle replays banding+verify over frozen phash64
    // BIGINTs; this pins that table against the REAL JDK decode + DCT, so
    // a decoder change breaks HERE (with the offending id) before it
    // breaks the driver gate
    val got = graft.queries.LlmPipeline.phashFixtureIds
      .map(id => (id, graft.queries.LlmPipeline.phashFixturePayload(id)))
      .toDF("img_id", "payload")
      .select(col("img_id"), expr("phash64(payload)").as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.queries.LlmPipeline.phashFixtureLiterals.foreach { case (id, want) =>
      assert(got(id) == want,
        s"fixture $id: decode gives ${got(id)}, oracle literal $want — regenerate the table")
    }
  }

  test("codegen and interpreted agree") {
    val df = Seq((1L, Multimodal.syntheticPng(7)), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
      .select(col("id"), expr("phash64(payload)").as("ph"))
    val gen = df.orderBy("id").collect().toSeq
    val k = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(k)
    spark.conf.set(k, "NO_CODEGEN")
    val interp =
      try df.orderBy("id").collect().toSeq
      finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    assert(gen == interp)
  }
}
