package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Metadata-only aggregate pushdown ([[StatsAggregates]]): global
  * count/min/max answered from manifest stats with ZERO file reads — the
  * plan collapses to a LocalTableScan. Each test checks BOTH the plan shape
  * (pushed vs fell back) and that values are identical to computing the
  * same aggregate the ordinary way at a different table state.
  */
class AggPushdownSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  private def isMetadataOnly(sql: String): Boolean = {
    val p = planOf(sql)
    p.contains("LocalTableScan") && !p.contains("BatchScan")
  }

  test("count(*)/count(c)/min/max across types answered from metadata, exactly") {
    val t = s"lake.aggpd.${uniq("basic")}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS lake.aggpd")
    spark.sql(
      s"""CREATE TABLE $t AS
         |SELECT id AS k,
         |  CAST(id % 7 AS INT) AS i,
         |  CAST(id * 1000 AS BIGINT) AS l,
         |  CAST(id AS DOUBLE) / 3.0 AS d,
         |  concat('s', lpad(CAST(id AS STRING), 5, '0')) AS s,
         |  CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id AS DECIMAL(12,2)) END AS dec,
         |  DATE_ADD(DATE'2024-01-01', CAST(id % 300 AS INT)) AS dt
         |FROM range(0, 5000)""".stripMargin)
    // several commits → several files, so the fold spans manifests
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id % 7 AS INT), id * 1000, CAST(id AS DOUBLE) / 3.0, " +
      "concat('s', lpad(CAST(id AS STRING), 5, '0')), " +
      "CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id AS DECIMAL(12,2)) END, " +
      "DATE_ADD(DATE'2024-01-01', CAST(id % 300 AS INT)) FROM range(5000, 9000)")

    val q = s"SELECT CAST(count(*) AS BIGINT) AS n, count(dec) AS nd, " +
      s"min(k) AS mk, max(k) AS xk, min(d) AS md, max(d) AS xd, " +
      s"min(dec) AS mdec, max(dec) AS xdec, " +
      s"min(dt) AS mdt, max(dt) AS xdt FROM $t"
    assert(isMetadataOnly(q), s"expected LocalTableScan plan, got:\n${planOf(q)}")

    val r = spark.sql(q).collect()(0)
    assert(r.getLong(0) == 9000L)
    assert(r.getLong(1) == 6000L) // every 3rd dec is NULL
    assert(r.getLong(2) == 0L && r.getLong(3) == 8999L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 8999.0 / 3.0)
    assert(r.getDecimal(6).compareTo(new java.math.BigDecimal("1.00")) == 0)
    assert(r.getDecimal(7).compareTo(new java.math.BigDecimal("8999.00")) == 0)
    assert(r.getDate(8).toString == "2024-01-01" && r.getDate(9).toString == "2024-10-26")

    // STRING min/max must NOT push: manifest string bounds are truncated
    // prefixes ([[StatBounds]]) — a pushed answer would be a widened bound
    // that exists in no row. The scan fallback stays correct.
    val qs = s"SELECT min(s) AS ms, max(s) AS xs FROM $t"
    assert(!isMetadataOnly(qs),
      s"string min/max must fall back to a real scan:\n${planOf(qs)}")
    val rs = spark.sql(qs).collect()(0)
    assert(rs.getString(0) == "s00000" && rs.getString(1) == "s08999")
    spark.sql(s"DROP TABLE $t")
  }

  test("empty table and all-NULL column: count 0 / NULL min-max, still metadata-only") {
    val t = s"lake.aggpd.${uniq("edge")}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS lake.aggpd")
    spark.sql(s"CREATE TABLE $t (k INT, v DOUBLE)")
    val q0 = s"SELECT count(*) AS n, min(k) AS mk, max(v) AS xv FROM $t"
    assert(isMetadataOnly(q0), s"empty table should push:\n${planOf(q0)}")
    val r0 = spark.sql(q0).collect()(0)
    assert(r0.getLong(0) == 0L && r0.isNullAt(1) && r0.isNullAt(2))

    spark.sql(s"INSERT INTO $t SELECT CAST(id AS INT), CAST(NULL AS DOUBLE) FROM range(0, 100)")
    val q1 = s"SELECT count(*) AS n, count(v) AS nv, min(v) AS mv, max(k) AS xk FROM $t"
    assert(isMetadataOnly(q1), s"all-null column should push:\n${planOf(q1)}")
    val r1 = spark.sql(q1).collect()(0)
    assert(r1.getLong(0) == 100L && r1.getLong(1) == 0L && r1.isNullAt(2) && r1.getInt(3) == 99)
    spark.sql(s"DROP TABLE $t")
  }

  test("GROUP BY a partition column: per-partition roll-up from metadata only") {
    val t = s"lake.aggpd.${uniq("grp")}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS lake.aggpd")
    spark.sql(s"CREATE TABLE $t (k BIGINT, g INT, v DOUBLE) PARTITIONED BY (g)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id % 5 AS INT), CAST(id AS DOUBLE) FROM range(0, 1000)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id % 5 AS INT), CAST(id AS DOUBLE) FROM range(1000, 1500)")

    val q = s"SELECT g, count(*) AS n, min(k) AS mk, max(v) AS xv FROM $t GROUP BY g"
    assert(isMetadataOnly(q), s"partition-column GROUP BY should push:\n${planOf(q)}")
    val rows = spark.sql(q).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(rows.length == 5)
    rows.foreach { case (g, n, mk, xv) =>
      assert(n == 300L, s"group $g count")
      assert(mk == g.toLong, s"group $g min k")
      assert(xv == (1495 + g).toDouble, s"group $g max v")
    }

    // grouping by a NON-single-valued column must fall back (and stay right)
    val qk = s"SELECT CAST(k % 2 AS INT) AS p, count(*) AS n FROM $t GROUP BY CAST(k % 2 AS INT)"
    assert(!isMetadataOnly(qk))
    assert(spark.sql(qk).collect().map(_.getLong(1)).sum == 1500L)
    spark.sql(s"DROP TABLE $t")
  }

  test("falls back to a real scan when filters, group-by, other aggs, or deletes") {
    val t = s"lake.aggpd.${uniq("fall")}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS lake.aggpd")
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES ('write.delete.mode'='merge-on-read') " +
      s"AS SELECT id AS k, CAST(id % 10 AS INT) AS g FROM range(0, 1000)")

    // sum / avg: not provable from stats
    assert(!isMetadataOnly(s"SELECT sum(k) AS s FROM $t"))
    // WHERE: residual filter → no pushdown
    assert(!isMetadataOnly(s"SELECT count(*) AS n FROM $t WHERE k > 10"))
    assert(spark.sql(s"SELECT count(*) AS n FROM $t WHERE k > 10").collect()(0).getLong(0) == 989L)
    // GROUP BY: refused
    assert(!isMetadataOnly(s"SELECT g, count(*) AS n FROM $t GROUP BY g"))

    // a positional tombstone makes file stats over-counts → must fall back
    spark.sql(s"DELETE FROM $t WHERE k % 100 = 7")
    val q = s"SELECT count(*) AS n, max(k) AS xk FROM $t"
    assert(!isMetadataOnly(q), s"deletes present: must not push:\n${planOf(q)}")
    val r = spark.sql(q).collect()(0)
    assert(r.getLong(0) == 990L && r.getLong(1) == 999L)
    spark.sql(s"DROP TABLE $t")
  }

  test("upserted table (equality deletes) falls back and stays correct") {
    val t = s"lake.aggpd.${uniq("ups")}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS lake.aggpd")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k, CAST(id AS STRING) AS v FROM range(0, 500)")
    spark.sql(s"SELECT id AS k, concat('u', id) AS v FROM range(450, 600)")
      .createOrReplaceTempView("aggpd_ups_src")
    spark.sql(s"CALL lake.system.upsert('${t.stripPrefix("lake.")}', 'aggpd_ups_src', 'k')")

    val q = s"SELECT count(*) AS n, max(k) AS xk FROM $t"
    assert(!isMetadataOnly(q), s"eq-deletes present: must not push:\n${planOf(q)}")
    val r = spark.sql(q).collect()(0)
    assert(r.getLong(0) == 600L && r.getLong(1) == 599L)
    spark.sql(s"DROP TABLE $t")
  }

  test("time travel pushes from the pinned snapshot's stats") {
    val t = s"lake.aggpd.${uniq("tt")}"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS lake.aggpd")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 100)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(100, 250)")
    val q1 = s"SELECT count(*) AS n, max(k) AS xk FROM $t VERSION AS OF 1"
    assert(isMetadataOnly(q1), s"time travel should push:\n${planOf(q1)}")
    val r1 = spark.sql(q1).collect()(0)
    assert(r1.getLong(0) == 100L && r1.getLong(1) == 99L)
    val r2 = spark.sql(s"SELECT count(*) AS n, max(k) AS xk FROM $t").collect()(0)
    assert(r2.getLong(0) == 250L && r2.getLong(1) == 249L)
    spark.sql(s"DROP TABLE $t")
  }
}
