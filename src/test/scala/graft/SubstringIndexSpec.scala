package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Winnowing.winnowFingerprints

/** q104's winnowed inverted index: LIKE '%phrase%' answered by probing a
  * bucket-partitioned fingerprint table instead of scanning text. Pins the
  * LOSSLESSNESS guarantee (needle length >= k+w-1 ⇒ zero false negatives,
  * exercised over every substring position of real docs) and the plan
  * shape (the index probe prunes files by bucket; the verify step touches
  * candidates only).
  */
class SubstringIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val (k, w) = (8, 8)

  private def needleFps(needle: String): Seq[Long] =
    spark.range(1)
      .select(explode(winnowFingerprints(lit(needle), k, w)).as("fp"))
      .collect().map(_.getLong(0)).distinct.toSeq

  test("winnowing probe has zero false negatives for needles >= k+w-1") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(40).collect()
    // every substring of length t = k+w-1 (stride 7 to bound runtime) of a
    // doc must share >= 1 fingerprint with that doc's winnowed set
    val t = k + w - 1
    docs.foreach { r =>
      val text = r.getString(1)
      val docFps = spark.range(1)
        .select(explode(winnowFingerprints(lit(text), k, w)).as("fp"))
        .collect().map(_.getLong(0)).toSet
      var pos = 0
      while (pos + t <= text.length) {
        val needle = text.substring(pos, pos + t)
        val shared = needleFps(needle).exists(docFps.contains)
        assert(shared, s"doc ${r.getLong(0)} pos $pos: needle '$needle' " +
          "shares no fingerprint with its own document — guarantee broken")
        pos += 7
      }
    }
  }

  test("index probe bucket-prunes files; end-to-end matches the LIKE scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.subx")
    spark.sql("DROP TABLE IF EXISTS lake.subx.idx")
    spark.sql(
      """CREATE TABLE lake.subx.idx (fp BIGINT, doc_id BIGINT)
        |PARTITIONED BY (bucket(8, fp))""".stripMargin)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.select(explode(array_distinct(winnowFingerprints(col("text"), k, w))).as("fp"),
        col("doc_id"))
      .writeTo("lake.subx.idx").append()

    val needle = "row column sort" // length 15 = k+w-1: guarantee applies
    val fps = needleFps(needle)
    val probe = spark.table("lake.subx.idx")
      .where(col("fp").isin(fps: _*)).select("doc_id").distinct()
    val found = docs.join(probe, "doc_id")
      .where(col("text").contains(needle))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val brute = docs.where(col("text").contains(needle))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(found == brute, "index probe must equal the brute-force LIKE scan")
    assert(brute.nonEmpty, "needle must actually occur (test data drifted?)")

    // plan shape: the probe scans a strict subset of the index's files
    // (bucket pruning from the fp IN (...) predicate)
    val scanFiles = "LakeScan\\(lake\\.subx\\.idx, (\\d+) files\\)".r
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      scanFiles.findAllMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1).toInt).min
    val total = planned(spark.table("lake.subx.idx").select("doc_id"))
    val probed = planned(probe)
    assert(probed < total,
      s"fp IN probe must bucket-prune the index scan ($probed vs $total files)")
  }
}
