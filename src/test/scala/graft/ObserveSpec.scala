package graft

import java.sql.Timestamp

import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `observe()` — pipeline data-quality metrics with ZERO extra passes.
  * A 100 TB curation job must report row counts / null rates / quality
  * tallies without re-scanning: CollectMetrics rides the existing plan
  * (accumulator-style, partial per task, merged on the driver), so the
  * metrics cost nothing beyond the action that ran anyway. Certify the
  * batch path (Observation) and the streaming path (per-batch
  * observedMetrics on the progress events).
  */
class ObserveSpec extends AnyFunSuite {
  import TestSpark._

  test("batch observe: metrics ride the write action, values exact, no second scan") {
    val li = Tables.t(spark, sf, "lineitem")
    val obs = Observation("curation")
    val out = li.observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("hi_qty"),
        max(col("l_extendedprice")).as("max_price"))
      .filter(col("l_discount") > 0.01) // metrics observe PRE-filter rows
    out.write.format("noop").mode("overwrite").save()
    val m = obs.get
    // cross-check against direct aggregation
    val r = li.agg(count(lit(1)), sum(when(col("l_quantity") > 25, 1L).otherwise(0L)),
      max(col("l_extendedprice"))).collect().head
    assert(m("rows_seen") == r.getLong(0))
    assert(m("hi_qty") == r.getLong(1))
    assert(m("max_price") == r.getDouble(2))
  }

  test("streaming observe: each micro-batch reports its own metrics on progress events") {
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)](spark)
    val seen = collection.mutable.ArrayBuffer[(Long, Long)]() // (rows, nulls)
    val q = input.toDF().toDF("id", "ts", "value")
      .observe("batch_quality",
        count(lit(1)).as("rows"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("neg_values"))
      .writeStream.format("noop").outputMode("append")
      .start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    input.addData((1L, t(1), 1.0), (2L, t(2), -3.0))
    q.processAllAvailable()
    input.addData((3L, t(3), -1.0), (4L, t(4), 2.0), (5L, t(5), -9.0))
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      Option(p.observedMetrics.get("batch_quality")).foreach { row =>
        if (row.getLong(0) > 0) seen += ((row.getLong(0), row.getLong(1)))
      }
    }
    q.stop()
    assert(seen.contains((2L, 1L)), s"first batch metrics missing: $seen")
    assert(seen.contains((3L, 2L)), s"second batch metrics missing: $seen")
  }
}
