package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q127's block-size cap under a planted hot block (r9; the SkewBench
  * fixture showed the uncapped form going quadratic on one giant
  * (nation, length, stem) block — the "John Smith" case of record
  * linkage). The cap must (a) bound per-block candidate generation at 512
  * rows, and (b) keep the census EXACTLY equal to brute force over the
  * deterministically-kept rows (512 smallest custkeys), so the loss is a
  * stated truncation, never a changed answer on the kept set.
  */
class FuzzyBlockCapSpec extends AnyFunSuite {
  import TestSpark._

  test("planted 1000-row hot block: census equals brute force over the 512 kept rows") {
    import spark.implicits._
    val sql = SparkEntry.oracleSql("q127_fuzzy_blocked_dedup")
    // one giant block: same nation, same length, same name-minus-last-3
    def name(i: Int): String = "HOTBLOCKNAME" +
      ('A' + i % 26).toChar + ('A' + (i / 26) % 26).toChar + ('A' + (i / 676) % 26).toChar
    val planted = (0 until 1000).map(i => (i.toLong, name(i), 7))
      .toDF("c_custkey", "c_name", "c_nationkey")
    planted.createOrReplaceTempView("customer")
    try {
      val got = spark.sql(sql).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toMap
      // brute force over exactly the kept rows (custkeys 0..511 — the
      // cap's deterministic smallest-key order), NO blocking involved
      val kept = planted.where(col("c_custkey") < 512)
      val expected = kept.as("a").join(kept.as("b"),
          col("a.c_custkey") < col("b.c_custkey"))
        .select(levenshtein(col("a.c_name"), col("b.c_name")).as("dist"))
        .where(col("dist") <= 2)
        .groupBy("dist").agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(expected.nonEmpty, "planted block must produce close pairs")
      assert(got == expected,
        s"capped census $got must equal brute force over kept rows $expected")
      // and the cap really bound the work: total pairs can never exceed
      // C(512,2), which the uncapped 1000-row block (C(1000,2)) would
      val total = got.values.sum
      assert(total <= 512L * 511 / 2)
    } finally {
      // restore the real view for any suite sharing this session
      spark.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("customer")
    }
  }

  test("cap does not bind on the real corpus: every block is far below 512") {
    val maxBlock = spark.read.parquet(s"$sf/customer.parquet")
      .groupBy(col("c_nationkey"), length(col("c_name")),
        expr("substring(c_name, 1, length(c_name) - 3)"))
      .agg(count(lit(1)).as("b")).agg(max("b")).collect()(0).getLong(0)
    assert(maxBlock < 512, s"corpus max block $maxBlock reached the cap — " +
      "the gate would silently truncate; raise the cap deliberately")
  }
}
