package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-defect tests for q134's expectation suite: the testdata is
  * clean (all violation counts 0 at every SF — which the oracle gate
  * verifies), so detection is proven here by feeding frames with known
  * nulls, range breaks, duplicate keys, and orphaned foreign keys.
  */
class QualityChecksSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(li: Seq[(java.lang.Long, Int, Long, Long, Double, Double)],
      orderKeys: Seq[Long]): Map[String, Long] = {
    val liDf = li.toDF("l_orderkey", "l_linenumber", "l_partkey",
      "l_suppkey", "l_quantity", "l_discount")
    val oDf = orderKeys.toDF("o_orderkey")
    graft.queries.Relational.qualityChecks(liDf, oDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("every check fires on its planted defect, exactly once each") {
    val li = Seq(
      (java.lang.Long.valueOf(1L), 1, 10L, 20L, 5.0, 0.05),  // clean
      (null.asInstanceOf[java.lang.Long], 1, 10L, 20L, 5.0, 0.05), // null key
      (java.lang.Long.valueOf(1L), 2, 10L, 20L, 99.0, 0.05), // qty out of range
      (java.lang.Long.valueOf(1L), 3, 10L, 20L, 5.0, 0.5),   // discount out of range
      (java.lang.Long.valueOf(1L), 4, 10L, 20L, 5.0, 0.05),  // dup pair (a)
      (java.lang.Long.valueOf(1L), 4, 10L, 20L, 6.0, 0.05),  // dup pair (b)
      (java.lang.Long.valueOf(7L), 1, 10L, 20L, 5.0, 0.05))  // orphan (no order 7)
    val got = run(li, orderKeys = Seq(1L))
    assert(got("null_orderkey") == 1, got.toString)
    assert(got("qty_range") == 1, got.toString)
    assert(got("discount_range") == 1, got.toString)
    assert(got("dup_order_line") == 1, got.toString) // one duplicated key group
    // 2: the explicit orphan AND the null-key row — a NULL key can never
    // match an order, and the SQL oracle's NOT EXISTS agrees (UNKNOWN
    // predicate → empty → counted), so both checks flag it by design
    assert(got("orphan_lineitem") == 2, got.toString)
  }

  test("clean input reports zero violations on every check") {
    val li = Seq(
      (java.lang.Long.valueOf(1L), 1, 10L, 20L, 5.0, 0.05),
      (java.lang.Long.valueOf(2L), 1, 11L, 21L, 50.0, 0.1))
    val got = run(li, orderKeys = Seq(1L, 2L))
    assert(got.values.forall(_ == 0L), got.toString)
    assert(got.keySet == Set("null_orderkey", "qty_range", "discount_range",
      "dup_order_line", "orphan_lineitem"))
  }
}
