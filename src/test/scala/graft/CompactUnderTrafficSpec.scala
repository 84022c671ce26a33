package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.LakeMaintenance

/** Compaction racing sustained upsert traffic (r11). Before this round, the
  * FIRST eq-delete landing between compact's scan and its commit surfaced
  * as a user-visible CommitConflictException; CommitContentionBench
  * measured compactors giving up 43/160 times at 16 writers. compact() now
  * re-plans from the fresh base (bounded), escalating to the advisory
  * commit lease when conflicts persist and the round is fast enough for
  * the TTL to cover rewrite+commit. This test races a real upsert loop
  * against compact and asserts completion + row-level correctness — the
  * race may or may not produce conflicts on a given run; completion under
  * EITHER schedule is the contract.
  */
class CompactUnderTrafficSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  test("compact completes and stays correct while upserts keep landing") {
    import spark.implicits._
    val t = s"lake.ups.${uniq("race")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ups")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    // seed MANY small files so compact has real rounds of work
    (0 until 6).foreach { e =>
      spark.sql(s"INSERT INTO $t SELECT id + ${e * 100}, 'seed$e' FROM range(100)")
    }
    @volatile var stop = false
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writer = new Thread(() => {
      var e = 0
      try while (!stop && e < 40) {
        // upsert epoch: rewrites keys 0..19 via eq-deletes — the commit
        // shape that conflicts with a concurrent rewrite
        val src = spark.range(20).select(col("id").as("k"),
          concat(lit("w"), lit(e)).as("v"))
        LakeMaintenance.upsert(spark, t, src, Seq("k"))
        e += 1
      } catch { case x: Throwable => errs.add(x) }
    })
    writer.start()
    try {
      // small batches: short rounds, many commits — the conflict-prone shape
      val (before, after) = LakeMaintenance.compact(spark, t,
        smallFileBytes = 64L * 1024 * 1024, maxFilesPerCommit = 4)
      assert(before > after || after > 0, s"compact made progress: $before -> $after")
    } finally { stop = true; writer.join(120000) }
    assert(errs.isEmpty, s"writer failed: ${errs.toArray.mkString("; ")}")
    // correctness after the dust settles: upsert semantics hold (one row
    // per key, latest write wins for the churned range), nothing lost
    val rows = spark.table(t).groupBy("k").count()
      .where(col("count") > 1).count()
    assert(rows == 0, "no duplicate keys after compact under traffic")
    assert(spark.table(t).count() == 600, "600 distinct keys stay live")
    // the churned keys carry a writer value, not a seed value
    val churned = spark.table(t).where(col("k") < 20)
      .select(col("v")).collect().map(_.getString(0))
    assert(churned.forall(_.startsWith("w")),
      s"keys 0..19 must hold the last upsert's values, got ${churned.take(3).mkString(",")}")
    // no lease left behind
    val (cat, ident, _) = LakeMaintenance.resolve(spark, t)
    assert(cat.pointerStore.peekLease(ident.namespace()(0), ident.name(),
      System.currentTimeMillis(), 10000L).isEmpty)
  }
}
