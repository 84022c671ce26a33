package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.LakeMaintenance

/** `CALL lake.system.analyze` — incremental per-column NDV statistics via
  * mergeable HLL sketches, surfaced to Catalyst as DSv2 columnStats.
  */
class AnalyzeSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  private def v2Stats(table: String): org.apache.spark.sql.catalyst.plans.logical.Statistics = {
    val plan = spark.table(table).queryExecution.optimizedPlan
    val rel = plan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.getOrElse(fail(s"no V2 scan relation in:\n$plan"))
    rel.computeStats()
  }

  test("full analyze: NDV estimates are exact at small cardinality; nulls ignored") {
    val t = s"lake.stats.${uniq("t")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stats")
    spark.sql(s"CREATE TABLE $t (k INT, s STRING, d DOUBLE)")
    spark.sql(s"INSERT INTO $t SELECT id % 7, concat('s', id % 13), " +
      s"CASE WHEN id % 11 = 0 THEN NULL ELSE CAST(id % 11 AS DOUBLE) END FROM range(200)")
    val (mode, ndvs) = LakeMaintenance.analyze(spark, t)
    assert(mode == "full")
    assert(ndvs.toMap == Map("k" -> 7L, "s" -> 13L, "d" -> 10L)) // d: 10 non-null values
  }

  test("incremental analyze unions only the appended delta; watermark advances") {
    val t = s"lake.stats.${uniq("inc")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stats")
    spark.sql(s"CREATE TABLE $t (k INT)")
    spark.sql(s"INSERT INTO $t SELECT id % 10 FROM range(100)")
    val (m1, n1) = LakeMaintenance.analyze(spark, t)
    assert(m1 == "full" && n1 == Seq("k" -> 10L))
    spark.sql(s"INSERT INTO $t SELECT 100 + id % 5 FROM range(50)")
    val (m2, n2) = LakeMaintenance.analyze(spark, t)
    assert(m2 == "incremental", "append-only range must take the delta path")
    assert(n2 == Seq("k" -> 15L), "union of old(10) and new(5) value sets")
    // watermark current: analyze is a no-op that reports stored estimates
    val (m3, n3) = LakeMaintenance.analyze(spark, t)
    assert(m3 == "current" && n3 == Seq("k" -> 15L))
  }

  test("row-changing history falls back to a full recompute (NDV can shrink)") {
    val t = s"lake.stats.${uniq("del")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stats")
    spark.sql(s"CREATE TABLE $t (k INT)")
    spark.sql(s"INSERT INTO $t SELECT id % 10 FROM range(100)")
    assert(LakeMaintenance.analyze(spark, t)._2 == Seq("k" -> 10L))
    spark.sql(s"DELETE FROM $t WHERE k >= 5")
    val (mode, ndvs) = LakeMaintenance.analyze(spark, t)
    assert(mode == "full", "a delete in the range cannot be folded into a sketch")
    assert(ndvs == Seq("k" -> 5L))
  }

  test("scan reports distinctCount and exact manifest nullCount to Catalyst") {
    val t = s"lake.stats.${uniq("cbo")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stats")
    spark.sql(s"CREATE TABLE $t (k INT, s STRING)")
    spark.sql(s"INSERT INTO $t SELECT id % 42, " +
      s"CASE WHEN id % 4 = 0 THEN NULL ELSE concat('x', id % 6) END FROM range(200)")
    LakeMaintenance.analyze(spark, t)
    val stats = v2Stats(t)
    val byName = stats.attributeStats.map { case (a, cs) => a.name -> cs }
    assert(byName.contains("k"), s"no column stats for k in $byName")
    assert(byName("k").distinctCount.map(_.toLong).contains(42L))
    assert(byName("s").distinctCount.map(_.toLong).contains(6L))
    // nullCount comes straight from manifests (no analyze required for it)
    assert(byName("s").nullCount.map(_.toLong).contains(50L))
    assert(byName("k").nullCount.map(_.toLong).contains(0L))
    assert(stats.rowCount.map(_.toLong).contains(200L))
  }

  test("scan reports exact typed min/max bounds for CBO range selectivity") {
    val t = s"lake.stats.${uniq("mm")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stats")
    spark.sql(s"CREATE TABLE $t (k INT, x BIGINT, d DOUBLE, s STRING)")
    spark.sql(s"INSERT INTO $t SELECT CAST(id % 50 AS INT), id * 3, " +
      s"CAST(id AS DOUBLE) / 4, concat('v', id) FROM range(200)")
    val byName = v2Stats(t).attributeStats.map { case (a, cs) => a.name -> cs }
    assert(byName("k").min.contains(0) && byName("k").max.contains(49), s"k: ${byName.get("k")}")
    assert(byName("x").min.contains(0L) && byName("x").max.contains(597L))
    assert(byName("d").min.contains(0.0) && byName("d").max.contains(49.75))
    // strings carry no typed bounds (estimation doesn't consume them)
    assert(byName.get("s").forall(cs => cs.min.isEmpty && cs.max.isEmpty))
  }

  test("CALL lake.system.analyze works through SQL; NDV survives reload") {
    val t = s"lake.stats.${uniq("sqlp")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stats")
    spark.sql(s"CREATE TABLE $t (k INT, s STRING)")
    spark.sql(s"INSERT INTO $t SELECT id % 3, concat('v', id % 4) FROM range(60)")
    val Array(_, ns, name) = t.split('.')
    val r = spark.sql(s"CALL lake.system.analyze(table => '$ns.$name')").collect()
    assert(r.length == 1 && r(0).getString(0) == "full" && r(0).getInt(1) == 2)
    // fresh handle (invalidate) still sees the stored sketches
    spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[graft.catalog.LakeCatalog]
      .invalidateTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name))
    val byName = v2Stats(t).attributeStats.map { case (a, cs) => a.name -> cs }
    assert(byName("k").distinctCount.map(_.toLong).contains(3L))
    assert(byName("s").distinctCount.map(_.toLong).contains(4L))
  }

  test("analyze maintains KLL sketches; scan reports an equi-height histogram that sees skew") {
    val t = s"lake.stats.${uniq("hist")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stats")
    spark.sql(s"CREATE TABLE $t (k INT, s STRING, d DATE)")
    // heavy skew: 190 rows of k=0, 10 outliers up to 1000 — min/max
    // interpolation is blind to this shape; the histogram is the point
    spark.sql(s"INSERT INTO $t SELECT CASE WHEN id < 190 THEN 0 ELSE CAST((id - 189) * 100 AS INT) END, " +
      s"concat('s', id), DATE'2024-01-01' + CAST(id % 30 AS INT) FROM range(200)")
    LakeMaintenance.analyze(spark, t)
    val byName = v2Stats(t).attributeStats.map { case (a, cs) => a.name -> cs }
    val h = byName("k").histogram.getOrElse(fail(s"no histogram for k: ${byName.get("k")}"))
    // equi-height invariant: height × bins == non-null rows
    assert(math.round(h.height * h.bins.length) == 200L, s"height=${h.height} bins=${h.bins.length}")
    // the heavy value owns its share of bins as lo==hi point bins (ndv 1)
    val pointBins = h.bins.count(b => b.lo == 0.0 && b.hi == 0.0 && b.ndv == 1L)
    assert(pointBins >= h.bins.length / 2, s"skew not captured: $pointBins/${h.bins.length} point bins")
    assert(h.bins.head.lo == 0.0 && h.bins.last.hi == 1000.0)
    // DATE histograms sketch epoch days (Catalyst's estimation domain)
    val hd = byName("d").histogram.getOrElse(fail("no histogram for d"))
    val day0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble
    assert(hd.bins.head.lo == day0 && hd.bins.last.hi == day0 + 29)
    // strings carry no histogram (no ordered-double domain)
    assert(byName("s").histogram.isEmpty)
  }

  test("incremental analyze unions KLL deltas: histogram covers both loads") {
    val t = s"lake.stats.${uniq("khist")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stats")
    spark.sql(s"CREATE TABLE $t (k INT)")
    spark.sql(s"INSERT INTO $t SELECT CAST(id AS INT) FROM range(100)")
    LakeMaintenance.analyze(spark, t)
    spark.sql(s"INSERT INTO $t SELECT CAST(1000 + id AS INT) FROM range(100)")
    val (mode, _) = LakeMaintenance.analyze(spark, t)
    assert(mode == "incremental")
    val byName = v2Stats(t).attributeStats.map { case (a, cs) => a.name -> cs }
    val h = byName("k").histogram.getOrElse(fail("no histogram after incremental analyze"))
    assert(math.round(h.height * h.bins.length) == 200L, "union must cover both loads")
    assert(h.bins.head.lo == 0.0 && h.bins.last.hi == 1099.0)
    // roughly half the mass below the gap, half above (quantile boundaries)
    val below = h.bins.count(_.hi <= 99.0)
    assert(below >= h.bins.length / 3 && below <= 2 * h.bins.length / 3, s"$below/${h.bins.length}")
  }

  test("analyze of selected columns only; unknown column rejected") {
    val t = s"lake.stats.${uniq("sel")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stats")
    spark.sql(s"CREATE TABLE $t (a INT, b INT)")
    spark.sql(s"INSERT INTO $t SELECT id % 4, id % 9 FROM range(100)")
    val (_, ndvs) = LakeMaintenance.analyze(spark, t, Seq("b"))
    assert(ndvs == Seq("b" -> 9L))
    val byName = v2Stats(t).attributeStats.map { case (a, cs) => a.name -> cs }
    assert(byName("b").distinctCount.map(_.toLong).contains(9L))
    assert(!byName.get("a").exists(_.distinctCount.isDefined))
    intercept[IllegalArgumentException] {
      LakeMaintenance.analyze(spark, t, Seq("nope"))
    }
  }
}
