package graft

import org.scalatest.funsuite.AnyFunSuite

/** SupportsReportOrdering: scans over tables whose files were written under
  * `write.sort-order` report per-partition sortedness, so a
  * storage-partitioned join needs NEITHER an exchange NOR a sort on either
  * side — the join runs entirely on storage layout. Pins the positive path,
  * the provenance guard (pre-property files don't qualify until compaction
  * rewrites them), and result correctness.
  */
class SortedScanSpec extends AnyFunSuite {
  import TestSpark._

  private def withSmj[A](f: => A): A = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  private def ddl(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS lake.sos.$name")
    spark.sql(s"""CREATE TABLE lake.sos.$name (k BIGINT, v BIGINT)
      |PARTITIONED BY (bucket(4, k))
      |TBLPROPERTIES ('write.sort-order'='k')""".stripMargin)
  }

  test("bucketed+sorted tables sort-merge join with no exchange AND no sort") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.sos")
    ddl("a"); ddl("b")
    spark.sql("INSERT INTO lake.sos.a SELECT id % 50, id FROM range(1000)")
    spark.sql("INSERT INTO lake.sos.b SELECT id % 50, id * 3 FROM range(500)")
    withSmj {
      val j = spark.sql(
        """SELECT a.k, a.v, b.v AS w FROM lake.sos.a a
          |JOIN lake.sos.b b ON a.k = b.k""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-partitioned join must not shuffle:\n$plan")
      assert(!plan.contains("Sort ["),
        s"pre-sorted scans must not re-sort:\n$plan")
      // 1000/50=20 a-rows x 10 b-rows per key
      assert(j.count() === 50L * 20 * 10)
    }
  }

  test("files written before the sort order was declared do not claim ordering") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.sos")
    spark.sql("DROP TABLE IF EXISTS lake.sos.c")
    spark.sql("""CREATE TABLE lake.sos.c (k BIGINT, v BIGINT)
      |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql("INSERT INTO lake.sos.c SELECT id % 50, id FROM range(1000)")
    // declaring the order AFTER the write must not retroactively bless the
    // existing (unsorted-provenance) files
    spark.sql("ALTER TABLE lake.sos.c SET TBLPROPERTIES ('write.sort-order'='k')")
    ddl("d")
    spark.sql("INSERT INTO lake.sos.d SELECT id % 50, id * 3 FROM range(500)")
    withSmj {
      def plan = spark.sql(
        """SELECT c.k FROM lake.sos.c c JOIN lake.sos.d d ON c.k = d.k""")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Sort ["),
        s"unsorted-provenance files must keep the sort:\n$plan")
      // compaction rewrites under the now-declared order and stamps the
      // provenance — the sort disappears
      spark.sql("CALL lake.system.compact('sos.c')")
      assert(!plan.contains("Sort ["),
        s"compacted sorted files must report ordering:\n$plan")
      assert(!plan.contains("Exchange"), s"SPJ must survive compaction:\n$plan")
    }
  }

  test("q97 runs the join with no exchange and no sort on either side") {
    val p = SparkEntry.queries("q97_sorted_spj_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ (MERGE hint):\n$p")
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(!p.substring(joinIdx).contains("Exchange"),
      s"sorted SPJ join must not shuffle its inputs:\n$p")
    assert(!p.substring(joinIdx).contains("Sort ["),
      s"sorted SPJ join must not re-sort its inputs:\n$p")
  }

  test("an upsert epoch suspends the ordering claim (eq-deletes pending)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.sos")
    ddl("e"); ddl("f")
    spark.sql("INSERT INTO lake.sos.e SELECT id % 50, id FROM range(1000)")
    spark.sql("INSERT INTO lake.sos.f SELECT id % 50, id * 3 FROM range(500)")
    spark.sql("SELECT CAST(1 AS BIGINT) AS k, CAST(999999 AS BIGINT) AS v")
      .createOrReplaceTempView("sos_e_src")
    spark.sql("CALL lake.system.upsert('sos.e', 'sos_e_src', 'k')")
    withSmj {
      val j = spark.sql(
        "SELECT e.k FROM lake.sos.e e JOIN lake.sos.f f ON e.k = f.k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Sort [") || plan.contains("Exchange"),
        s"a scan with pending eq-deletes must not claim sorted partitions:\n$plan")
      // and the data is still right: k=1 now has 21 e-rows (20 + upserted...
      // no: upsert REPLACES by key -> k=1 has 20 olds killed? k is not unique
      // pre-upsert; the eq-delete kills ALL older k=1 rows, the epoch adds 1.
      assert(j.where("e.k = 1").count() === 1L * 10)
    }
  }
}
