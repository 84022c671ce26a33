package graft

import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime re-planning over lake scans — the knobs Sessions enables
  * (skew-join splitting, partition coalescing) must actually ENGAGE on our
  * DSv2 scans, not just be configured: at 100 TB a single hot key turns a
  * sort-merge join task into the straggler that owns the job's wall clock,
  * and AQE's skew split is the standing answer.
  */
class AqeSpec extends AnyFunSuite {
  import TestSpark._

  test("a hot key on a lake-table join triggers AQE skew splitting") {
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"))
    // scale the skew thresholds down to test size (defaults are 256 MB)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.aqe")
      spark.sql("DROP TABLE IF EXISTS lake.aqe.fact")
      spark.sql("DROP TABLE IF EXISTS lake.aqe.dim")
      // 95% of fact rows share key 0 — the hot-key shape
      spark.sql("CREATE TABLE lake.aqe.fact (k BIGINT, payload STRING)")
      spark.sql(
        """INSERT INTO lake.aqe.fact
          |SELECT IF(id % 20 = 0, id % 50, 0), repeat('x', 64) FROM range(40000)""".stripMargin)
      spark.sql("CREATE TABLE lake.aqe.dim (k BIGINT, attr STRING)")
      spark.sql("INSERT INTO lake.aqe.dim SELECT id, concat('a', id) FROM range(50)")
      // global aggregate above the join: no output-partitioning
      // requirement, so AQE is free to split the hot partition (a groupBy
      // on the join key would pin the partitioning and veto the split);
      // summing payload length drags the wide column through the shuffle
      val q = spark.sql(
        """SELECT count(*) AS n, sum(length(f.payload)) AS b FROM lake.aqe.fact f
          |JOIN lake.aqe.dim d ON f.k = d.k""".stripMargin)
      val rows = q.collect()
      assert(rows.head.getLong(0) == 40000L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must split the hot-key partition (no skew=true in plan):\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("a skewed partition value splits across WRITE tasks (AQE rebalance, non-strict clustering)") {
    val prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    // scale the rebalance target down to test size so the hot partition
    // value is "skewed" relative to it
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.aqe")
      spark.sql("DROP TABLE IF EXISTS lake.aqe.skw")
      spark.sql("CREATE TABLE lake.aqe.skw (p BIGINT, payload STRING) PARTITIONED BY (p)")
      // 99% of rows share partition value 0; md5 payload resists shuffle
      // compression so the partition's byte size reflects its row count
      spark.sql(
        """INSERT INTO lake.aqe.skw
          |SELECT IF(id % 100 = 0, 1 + id % 7, 0),
          |  concat(md5(CAST(id AS STRING)), md5(CAST(id + 7 AS STRING)))
          |FROM range(50000)""".stripMargin)
      val files = spark.sql(
        "SELECT min_values['p'] AS mn, max_values['p'] AS mx FROM lake.aqe.`skw$files`")
        .collect().map(r => (r.getString(0), r.getString(1)))
      // under STRICT clustering the hot value would be one task = one file;
      // the AQE rebalance must split it across tasks — no write straggler
      val hot = files.count(_._1 == "0")
      assert(hot > 1, s"hot partition value must split across write tasks: ${files.toSeq}")
      // every file is still single-valued on the partition column: stats
      // pruning, dynamic-overwrite attribution and metadata-only GROUP BY
      // pushdown all survive the split
      assert(files.forall { case (mn, mx) => mn == mx },
        s"split files must stay single-valued on p: ${files.toSeq}")
      assert(spark.table("lake.aqe.skw").count() == 50000)
      // values land where they should after the rebalance
      val expect = spark.sql(
        "SELECT count(*) FROM range(50000) WHERE id % 100 = 0 AND 1 + id % 7 = 3")
        .head().getLong(0)
      val cold = spark.sql("SELECT count(*) AS n FROM lake.aqe.skw WHERE p = 3")
      assert(cold.head().getLong(0) == expect)
      spark.sql("DROP TABLE lake.aqe.skw")
    } finally spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)
  }
}
