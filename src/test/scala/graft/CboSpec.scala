package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.plans.logical.Join

import graft.catalog.LakeMaintenance

/** End-to-end proof that Catalyst's cost-based optimizer CONSUMES the
  * analyze-maintained statistics (NDV sketches, manifest null counts,
  * typed min/max, KLL histograms) — not just that the scan reports them.
  */
class CboSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("histogram drives range-filter selectivity under CBO (min/max interpolation cannot)") {
    val t = s"lake.cbo.${uniq("sel")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.cbo")
    spark.sql(s"CREATE TABLE $t (k INT)")
    // 990 rows of k=5, 10 outliers up to 1004: `k <= 10` keeps 99% of rows,
    // but uniform min/max interpolation over [5, 1004] estimates ~0.5%.
    // Only the histogram knows where the mass sits.
    spark.sql(s"INSERT INTO $t SELECT CASE WHEN id < 990 THEN 5 " +
      s"ELSE CAST(id + 5 AS INT) END FROM range(1000)")
    LakeMaintenance.analyze(spark, t)
    withConf("spark.sql.cbo.enabled" -> "true") {
      val est = spark.table(t).where("k <= 10")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.isDefined, "CBO must produce a row-count estimate")
      assert(est.get.toLong >= 500,
        s"histogram-aware estimate should be ~990 rows, got ${est.get} " +
          "(a min/max interpolation would say ~5)")
    }
  }

  test("analyze stats drive cost-based join reordering") {
    val ns = "lake.cbo"
    val f = s"$ns.${uniq("fact")}"
    val d1 = s"$ns.${uniq("dimbig")}"
    val d2 = s"$ns.${uniq("dimtiny")}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
    spark.sql(s"CREATE TABLE $f (a INT, b INT, v DOUBLE)")
    spark.sql(s"CREATE TABLE $d1 (a INT, pa STRING)")
    spark.sql(s"CREATE TABLE $d2 (b INT, pb STRING)")
    // fact 20k rows; d1 joins 1:1 on 2000 distinct a (no reduction);
    // d2 has 5 of the fact's 100 b-values -> f⋈d2 collapses to ~5%.
    spark.sql(s"INSERT INTO $f SELECT CAST(id % 2000 AS INT), CAST(id % 100 AS INT), " +
      s"CAST(id AS DOUBLE) FROM range(20000)")
    spark.sql(s"INSERT INTO $d1 SELECT CAST(id AS INT), concat('a', id) FROM range(2000)")
    spark.sql(s"INSERT INTO $d2 SELECT CAST(id AS INT), concat('b', id) FROM range(5)")
    Seq(f, d1, d2).foreach(LakeMaintenance.analyze(spark, _))

    val sql = s"SELECT count(*) FROM $f f JOIN $d1 d1 ON f.a = d1.a JOIN $d2 d2 ON f.b = d2.b"
    def bottomJoinLeaves(): String = {
      val plan = spark.sql(sql).queryExecution.optimizedPlan
      val bottom = plan.collect { case j: Join => j }
        .find(j => j.collect { case jj: Join => jj }.size == 1)
        .getOrElse(fail(s"no leaf-level join in:\n$plan"))
      bottom.collectLeaves().mkString("\n")
    }
    // syntactic order: (f ⋈ d1) first
    val before = bottomJoinLeaves()
    assert(before.contains(f.split('.').last) && before.contains(d1.split('.').last),
      s"without CBO the bottom join should be the syntactic (fact, dimbig):\n$before")
    // with CBO + reorder: the selective tiny dim joins the fact FIRST
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val after = bottomJoinLeaves()
      assert(after.contains(f.split('.').last) && after.contains(d2.split('.').last),
        s"CBO should reorder (fact ⋈ dimtiny) to the bottom:\n$after")
    }
  }

  test("histogram-small build side broadcasts at PLAN time; AQE rescues at RUN time without CBO") {
    // The case min/max sizing gets wrong: a skew-tailed dim where a range
    // filter keeps 11 of 200k rows. Uniform interpolation over
    // [5, 1_050_000] estimates ~50% → no broadcast; the KLL histogram
    // knows the mass sits at k=5 → tiny build side → broadcast without
    // ever starting a shuffle. With CBO off, the initial plan is a
    // sort-merge join and AQE converts it AFTER the build side's true
    // size materializes — the histogram saves the shuffle AQE only
    // truncates. Both layers proven here.
    val ns = "lake.cbo"
    val dim = s"$ns.${uniq("skdim")}"
    val fact = s"$ns.${uniq("skfact")}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
    spark.sql(s"CREATE TABLE $dim (k INT, pad STRING)")
    spark.sql(s"CREATE TABLE $fact (k INT, fpad STRING)")
    // 199,979 rows of k=5; 21 outliers at 50_000 × i (i = 1..21). The pad
    // is incompressible so the FILE byte size (the only pre-analyze
    // signal) is honestly megabytes.
    spark.sql(s"INSERT INTO $dim SELECT CASE WHEN id < 199979 THEN 5 " +
      "ELSE CAST((id - 199978) * 50000 AS INT) END, md5(CAST(id AS STRING)) " +
      "FROM range(200000)")
    spark.sql(s"INSERT INTO $fact SELECT CAST(500000 + (id % 11) * 50000 AS INT), " +
      "md5(CAST(id + 7 AS STRING)) FROM range(20000)")

    def query() = spark.sql(
      s"SELECT count(*) AS n FROM $fact f JOIN $dim d ON f.k = d.k WHERE d.k >= 500000")
    // BEFORE analyze: only coarse manifest min/max exists, interpolation
    // over [5, 1_050_000] calls the filtered dim large → sort-merge at
    // plan time, and AQE converts to broadcast only after the shuffle's
    // build side materializes as 11 rows
    withConf(
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "32768") {
      val q = query()
      val initial = q.queryExecution.executedPlan.toString
      assert(initial.contains("SortMergeJoin"),
        s"coarse min/max sizing must NOT broadcast at plan time:\n$initial")
      assert(q.collect().head.getLong(0) == 20000L)
      val finalPlan = q.queryExecution.executedPlan.toString
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"AQE must convert to broadcast once the 11-row build side materializes:\n$finalPlan")
    }
    // AFTER analyze: the KLL histogram knows the mass sits at k=5, so the
    // build side estimates tiny and the broadcast happens at PLAN time —
    // no shuffle ever starts (AQE remains the safety net, not the plan)
    Seq(dim, fact).foreach(LakeMaintenance.analyze(spark, _))
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "32768") {
      val q = query()
      val initial = q.queryExecution.executedPlan.toString
      assert(initial.contains("BroadcastHashJoin"),
        s"histogram estimate (~11 rows) must pick broadcast at plan time:\n$initial")
      assert(q.collect().head.getLong(0) == 20000L)
    }
  }
}
