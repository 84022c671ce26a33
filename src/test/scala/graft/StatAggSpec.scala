package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark's built-in single-pass statistical aggregates against q119's
  * exact-moment formulation: the builtins (Welford-style partition merges)
  * are float-order-dependent, so they can't ride the bit-exact oracle gate,
  * but they must agree with the exact decimal-moment statistics to within
  * numerical noise — this is what certifies the builtin surface
  * (stddev_samp / var_samp / covar_samp / corr) works.
  */
class StatAggSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("builtin stddev/covar/corr match the exact-moment statistics within 1e-9") {
    val li = Tables.t(spark, sf, "lineitem")
    val builtin = li.groupBy(col("l_returnflag").as("flag"))
      .agg(stddev_samp(col("l_quantity")).as("sd"),
        covar_samp(col("l_quantity"), col("l_linenumber")).as("cov"),
        corr(col("l_quantity"), col("l_linenumber")).as("co"),
        var_samp(col("l_quantity")).as("va"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = SparkEntry.queries("q119_stat_aggregates")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(builtin.keySet == exact.keySet)
    for ((flag, (sd, cov, co, va)) <- builtin) {
      val (esd, ecov, eco) = exact(flag)
      assert(math.abs(sd - esd) <= 1e-9 * math.max(1.0, esd.abs), s"stddev($flag)")
      assert(math.abs(cov - ecov) <= 1e-9 * math.max(1.0, ecov.abs), s"covar($flag)")
      assert(math.abs(co - eco) <= 1e-9 * math.max(1.0, eco.abs), s"corr($flag)")
      assert(math.abs(va - esd * esd) <= 1e-9 * math.max(1.0, esd * esd), s"var($flag)")
    }
  }

  test("approx_percentile honors its rank-error bound against the exact percentile") {
    // accuracy=10000 guarantees rank error <= n/10000 (< 1 at this SF), so
    // the sketch must return an order statistic adjacent to the true rank;
    // l_quantity's support is integers spaced 1 apart and the exact
    // percentile interpolates, so |approx - exact| <= 1.0 is the sound
    // bound. Certifies the approx surface next to q73's exact (oracled)
    // percentile path.
    val li = Tables.t(spark, sf, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("exact"),
        expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)").as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getSeq[Double](1)
      val approx = r.getSeq[Double](2)
      exact.zip(approx).zipWithIndex.foreach { case ((e, a), i) =>
        assert(math.abs(e - a) <= 1.0,
          s"flag=${r.getString(0)} p[$i]: exact=$e approx=$a")
      }
    }
  }
}
