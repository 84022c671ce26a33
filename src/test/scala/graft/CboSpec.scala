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
}
