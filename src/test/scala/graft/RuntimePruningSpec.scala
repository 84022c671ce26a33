package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning on lake scans: partition-source columns are
  * declared runtime-filterable (SupportsRuntimeV2Filtering), so a star
  * join whose dim side is filtered prunes fact FILES mid-query — only the
  * partitions whose keys survive the dim filter are read.
  */
class RuntimePruningSpec extends AnyFunSuite {
  import TestSpark._

  test("a filtered dim join prunes fact files at runtime (identity partitions)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.dpp")
    spark.sql("DROP TABLE IF EXISTS lake.dpp.fact")
    spark.sql("DROP TABLE IF EXISTS lake.dpp.dim")
    spark.sql("CREATE TABLE lake.dpp.fact (k INT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO lake.dpp.fact SELECT CAST(id % 10 AS INT), id FROM range(1000)")
    spark.sql("CREATE TABLE lake.dpp.dim (k INT, attr STRING)")
    spark.sql(
      "INSERT INTO lake.dpp.dim SELECT CAST(id AS INT), IF(id = 3, 'hit', 'miss') FROM range(10)")
    val q = spark.sql(
      """SELECT f.k, count(*) AS n, sum(f.v) AS sv
        |FROM lake.dpp.fact f JOIN lake.dpp.dim d ON f.k = d.k
        |WHERE d.attr = 'hit' GROUP BY f.k""".stripMargin)
    val rows = q.collect()
    // correctness: only k=3 survives; 100 fact rows for that key
    assert(rows.toSeq.map(r => (r.getInt(0), r.getLong(1))) == Seq((3, 100L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic pruning predicate on the fact scan:\n$plan")
    // the scan description prints the CURRENT file list size; after
    // execution the runtime filter has pruned it to the single matching
    // partition file
    val scanDesc = "LakeScan\\(lake\\.dpp\\.fact, (\\d+) files\\)".r
    val counts = scanDesc.findAllMatchIn(plan).map(_.group(1).toInt).toSeq
    assert(counts.nonEmpty, s"fact scan description missing:\n$plan")
    assert(counts.min == 1,
      s"runtime filter should prune the fact scan to 1 file, got $counts:\n$plan")
  }

  test("bucketed-table join with an unbucketed side: only the unbucketed side shuffles") {
    val prevShuffle = spark.conf.get("spark.sql.sources.v2.bucketing.shuffle.enabled", "false")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.dpp")
      spark.sql("DROP TABLE IF EXISTS lake.dpp.idx")
      spark.sql("CREATE TABLE lake.dpp.idx (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
      spark.sql("INSERT INTO lake.dpp.idx SELECT id % 500, id FROM range(5000)")
      val probe = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS w")
      val j = spark.table("lake.dpp.idx").join(probe, "k")
      assert(j.count() == 1000L) // 100 probe keys x 10 rows each
      val plan = j.queryExecution.executedPlan.toString
      val nExchanges = "Exchange".r.findAllIn(plan).size
      // the bucketed index side reports its storage partitioning; only the
      // ad-hoc probe side should need an exchange (storage-aligned join)
      assert(nExchanges <= 1,
        s"expected at most one exchange (probe side only), got $nExchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", prevShuffle)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("runtime pruning composes with bucket partitioning") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.dpp")
    spark.sql("DROP TABLE IF EXISTS lake.dpp.bfact")
    spark.sql("DROP TABLE IF EXISTS lake.dpp.bdim")
    spark.sql(
      "CREATE TABLE lake.dpp.bfact (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO lake.dpp.bfact SELECT id % 64, id FROM range(2000)")
    spark.sql("CREATE TABLE lake.dpp.bdim (k BIGINT, attr STRING)")
    spark.sql(
      "INSERT INTO lake.dpp.bdim SELECT id, IF(id = 7, 'hit', 'miss') FROM range(64)")
    val q = spark.sql(
      """SELECT f.k, count(*) AS n FROM lake.dpp.bfact f
        |JOIN lake.dpp.bdim d ON f.k = d.k
        |WHERE d.attr = 'hit' GROUP BY f.k""".stripMargin)
    val rows = q.collect()
    assert(rows.toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((7L, 32L)) ||
      rows.toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((7L, 2000L / 64)))
    val plan = q.queryExecution.executedPlan.toString
    // bucket transform: the runtime keys map through the same murmur3
    // bucketing the writer used, pruning to the single matching bucket
    val scanDesc = "LakeScan\\(lake\\.dpp\\.bfact, (\\d+) files\\)".r
    val counts = scanDesc.findAllMatchIn(plan).map(_.group(1).toInt).toSeq
    if (plan.contains("dynamicpruning")) {
      assert(counts.nonEmpty && counts.min == 1,
        s"runtime filter should prune to the single bucket file, got $counts:\n$plan")
    }
  }
}
