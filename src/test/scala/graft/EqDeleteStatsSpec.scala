package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** estimateStatistics under equality deletes (VERDICT r10 #6). The r10
  * estimator charged one kill per delete ROW: a blind-upsert stream
  * (insert + delete for every key, every epoch) drove the row estimate to
  * ~zero even though |keys| rows are live — and an underestimated fact
  * table is a broadcast OOM at 100 TB. The r11 estimator bounds kills by
  * what was KILLABLE (commit-order greedy over key-range-overlapping older
  * files); this suite pins the estimate inside a factor band on a
  * 100-epoch upsert table and exact behavior where exactness is knowable.
  */
class EqDeleteStatsSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  private def v2RowEstimate(table: String): BigInt = {
    val plan = spark.table(table).queryExecution.optimizedPlan
    val rel = plan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.getOrElse(fail(s"no V2 scan relation in:\n$plan"))
    rel.computeStats().rowCount.getOrElse(fail("no row estimate reported"))
  }

  private def upsertEpochs(t: String, epochs: Seq[Seq[UpsRow]]): Unit = {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-eqstats").toString
    val input = MemoryStream[UpsRow](spark)
    val q = input.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .option("upsert-keys", "k")
      .toTable(t)
    try epochs.foreach { batch => input.addData(batch: _*); q.processAllAvailable() }
    finally q.stop()
  }

  test("100-epoch blind upsert of the same keys: estimate within 2x of the live count") {
    val t = s"lake.ups.${uniq("churn")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ups")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING, n INT)")
    val keys = 0L until 20L
    upsertEpochs(t, (1 to 100).map(e =>
      keys.map(k => UpsRow(k, s"v$e", e)).toSeq))
    val live = spark.table(t).count()
    assert(live == keys.size, "sanity: upsert semantics keep one row per key")
    val est = v2RowEstimate(t)
    // r10's estimator reported ~0 here (2000 inserted − 2000 delete rows);
    // the killable bound recovers ~|keys|
    assert(est >= BigInt(live) / 2 && est <= BigInt(live) * 2,
      s"estimate $est outside [${live / 2}, ${live * 2}] for $live live rows")
  }

  test("disjoint-key epochs (pure growth): estimate stays exact") {
    val t = s"lake.ups.${uniq("grow")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ups")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING, n INT)")
    upsertEpochs(t, (0 until 5).map(e =>
      (e * 10L until e * 10L + 10L).map(k => UpsRow(k, s"v$e", e)).toSeq))
    val live = spark.table(t).count()
    assert(live == 50)
    // disjoint key RANGES: every delete file's bounds miss every older
    // file, so the killable bound is 0 and the estimate is exact
    assert(v2RowEstimate(t) == BigInt(50), "disjoint ranges must estimate exactly")
  }

  test("re-upsert of one existing range: kills bounded by the overlapped epoch") {
    val t = s"lake.ups.${uniq("hit")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ups")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING, n INT)")
    upsertEpochs(t, Seq(
      (0L until 10L).map(k => UpsRow(k, "a", 1)).toSeq, // epoch 1: keys 0..9
      (100L until 110L).map(k => UpsRow(k, "b", 2)).toSeq, // epoch 2: keys 100..109
      (0L until 10L).map(k => UpsRow(k, "c", 3)).toSeq)) // epoch 3 re-upserts 0..9
    val live = spark.table(t).count()
    assert(live == 20)
    val est = v2RowEstimate(t)
    // exact here: epoch 3's 10 delete rows overlap only epoch 1's 10 rows
    assert(est == BigInt(20), s"estimate $est must equal the 20 live rows")
  }
}
