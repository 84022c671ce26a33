package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmPipeline

/** q128's r11 saturation guardrail under a PLANTED saturated band alphabet
  * (the r10 scale curve's 27.4×-at-10×-data shape: dense sequential 9-digit
  * id tails give each 3-char interleaved band ≲10³ distinct values, so
  * blocks grow ~n/const and probe pairs ~n²). Pins:
  *   (a) fail-fast: `graft.hamming.fail-on-saturation` turns the warn into
  *       an IllegalStateException naming the band and its max block;
  *   (b) the opt-in block cap keeps the census EXACTLY equal to a local
  *       brute-force model over the per-band kept rows (cap = smallest-id
  *       rows per band block — a stated truncation, never a changed answer
  *       on the kept set);
  *   (c) the dropped-pair accounting equals Σ C(n,2) − C(min(n,cap),2)
  *       block by block;
  *   (d) the default LOSSLESS path still matches all-pairs brute force on
  *       the saturated fixture (the pigeonhole guarantee is unchanged);
  *   (e) the real corpus stays far below the default bound, so the gate
  *       path never warns or truncates.
  */
class HammingGuardrailSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // dense sequential zero-padded tails on one stem: the saturating shape
  private val N = 3000
  private def plantedNames: Seq[(Long, String)] =
    (0 until N).map(i => (i.toLong, f"SATURATED#$i%09d"))
  private def plantedDf = plantedNames.toDF("id", "name")

  private def tail(name: String): String = name.takeRight(9)
  private def stem(name: String): String = name.dropRight(9)
  private def bval(t: String, band: Int): String =
    "" + t(band) + t(band + 3) + t(band + 6)
  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  /** Local model of the banded census: per band, group rows by
    * (stem, len, bval), optionally keep the `cap` smallest ids per block,
    * emit within-block pairs at tail-hamming ≤ 2; union-distinct across
    * bands; census by distance.
    */
  private def localCensus(rows: Seq[(Long, String)], cap: Option[Int]): Map[Int, Long] = {
    val keyed = rows.map { case (id, n) => (id, stem(n), n.length, tail(n)) }
    val pairs = (0 until 3).flatMap { band =>
      keyed.groupBy { case (_, st, len, t) => (st, len, bval(t, band)) }
        .values.flatMap { block =>
          val kept = block.sortBy(_._1).take(cap.getOrElse(Int.MaxValue))
          for {
            a <- kept; b <- kept if a._1 < b._1
            d = hamming(a._4, b._4) if d <= 2
          } yield (a._1, b._1, d)
        }
    }.distinct
    pairs.groupBy(_._3).map { case (d, ps) => d -> ps.size.toLong }
  }

  private def runCensus(): Map[Int, Long] =
    LlmPipeline.hammingBandedCensus(spark, plantedDf).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap

  test("fail-fast: saturated bands throw when graft.hamming.fail-on-saturation is set") {
    spark.conf.set("graft.hamming.saturation-bound", "100")
    spark.conf.set("graft.hamming.fail-on-saturation", "true")
    try {
      val e = intercept[IllegalStateException](runCensus())
      assert(e.getMessage.contains("SATURATION"), e.getMessage)
      assert(e.getMessage.contains("max block"), e.getMessage)
    } finally {
      spark.conf.unset("graft.hamming.saturation-bound")
      spark.conf.unset("graft.hamming.fail-on-saturation")
    }
  }

  test("the block cap bounds work and matches brute force over the kept rows") {
    spark.conf.set("graft.hamming.block-cap", "50")
    try {
      val got = runCensus()
      val want = localCensus(plantedNames, Some(50))
      assert(want.nonEmpty, "planted fixture must produce close pairs under the cap")
      assert(got == want, s"capped census $got != local model $want")
      // and the cap genuinely truncated: the lossless census is strictly larger
      val lossless = localCensus(plantedNames, None)
      assert(lossless.values.sum > want.values.sum,
        "fixture must make the cap bind, or this test pins nothing")
    } finally spark.conf.unset("graft.hamming.block-cap")
  }

  test("dropped-pair accounting: profile reports Σ C(n,2) − C(min(n,cap),2) per band") {
    val cap = 50
    val prof = LlmPipeline.hammingBandProfile(
        LlmPipeline.hammingKeyed(plantedDf), Some(cap))
      .collect().map(r => r.getAs[Int]("band") ->
        (r.getAs[Long]("max_block"), r.getAs[Long]("pairs_upper"),
          r.getAs[Long]("dropped_pairs_upper"))).toMap
    val keyed = plantedNames.map { case (id, n) => (id, stem(n), n.length, tail(n)) }
    (0 until 3).foreach { band =>
      val sizes = keyed.groupBy { case (_, st, len, t) => (st, len, bval(t, band)) }
        .values.map(_.size.toLong)
      def c2(n: Long) = n * (n - 1) / 2
      val (gotMax, gotPairs, gotDropped) = prof(band)
      assert(gotMax == sizes.max, s"band $band max block")
      assert(gotPairs == sizes.map(c2).sum, s"band $band pairs_upper")
      assert(gotDropped == sizes.map(n => c2(n) - c2(math.min(n, cap.toLong))).sum,
        s"band $band dropped_pairs_upper")
    }
  }

  test("default path stays lossless on an UNSATURATED fixture (pigeonhole unchanged)") {
    // the planted fixture's max band block (~300) sits under the default
    // 4096 bound, so no saturation trips and the census is lossless
    val got = runCensus() // no conf: nothing engages
    val want = localCensus(plantedNames, None)
    assert(want.nonEmpty && got == want, s"lossless census $got != brute force $want")
  }

  test("r12 default: saturation AUTO-ENGAGES the cap (the naive user gets the bounded plan)") {
    spark.conf.set("graft.hamming.saturation-bound", "100") // planted max block ~300 trips it
    spark.conf.set("graft.hamming.auto-cap", "50")
    try {
      val got = runCensus() // no block-cap, no lossless: auto-cap must engage
      val want = localCensus(plantedNames, Some(50))
      assert(want.nonEmpty && got == want, s"auto-capped census $got != local model $want")
      assert(localCensus(plantedNames, None).values.sum > want.values.sum,
        "fixture must make the auto-cap bind, or this test pins nothing")
    } finally {
      spark.conf.unset("graft.hamming.saturation-bound")
      spark.conf.unset("graft.hamming.auto-cap")
    }
  }

  test("graft.hamming.lossless=true opts back into the unbounded census under saturation") {
    spark.conf.set("graft.hamming.saturation-bound", "100")
    spark.conf.set("graft.hamming.auto-cap", "50")
    spark.conf.set("graft.hamming.lossless", "true")
    try {
      val got = runCensus()
      val want = localCensus(plantedNames, None)
      assert(got == want, s"opted-in lossless census $got != brute force $want")
    } finally {
      spark.conf.unset("graft.hamming.saturation-bound")
      spark.conf.unset("graft.hamming.auto-cap")
      spark.conf.unset("graft.hamming.lossless")
    }
  }

  test("explicit block-cap still wins over the auto-cap") {
    spark.conf.set("graft.hamming.saturation-bound", "100")
    spark.conf.set("graft.hamming.auto-cap", "200")
    spark.conf.set("graft.hamming.block-cap", "50")
    try {
      val got = runCensus()
      assert(got == localCensus(plantedNames, Some(50)),
        "explicit cap must take precedence over the saturation auto-cap")
    } finally {
      spark.conf.unset("graft.hamming.saturation-bound")
      spark.conf.unset("graft.hamming.auto-cap")
      spark.conf.unset("graft.hamming.block-cap")
    }
  }

  test("real corpus is far below the default bound: the gate never warns or truncates") {
    val maxBlock = SparkEntry.queries("q185_hamming_block_profile")(spark, sf)
      .agg(max("max_block")).collect()(0).getLong(0)
    assert(maxBlock < 4096, s"corpus max band block $maxBlock reached the default " +
      "saturation bound — the gate path would warn; raise the bound deliberately")
  }
}
