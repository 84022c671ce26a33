package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{LakeMaintenance, Materialized}

/** Incrementally-maintained materialized aggregates: incremental ==
  * from-scratch, exactly-once watermark, no-op idempotence, and the
  * honesty rule on rewritten source history.
  */
class MaterializedSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  private def meta(t: String) = {
    val Array(_, ns, name) = t.split('.')
    spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name))
      .asInstanceOf[graft.catalog.LakeTable].meta
  }

  test("refresh folds only new snapshots; result equals the from-scratch aggregate") {
    val src = s"lake.mvs.${uniq("src")}"
    val mvT = s"lake.mvs.${uniq("agg")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mvs")
    spark.sql(s"CREATE TABLE $src (g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $src VALUES ('a', 1.5), ('a', 2.5), ('b', 10.0)")
    spark.sql(s"CALL lake.system.create_aggregate('${mvT.stripPrefix("lake.")}'," +
      s" '${src.stripPrefix("lake.")}', 'g', 'v', 'v', 'v')")
    spark.sql(s"CALL lake.system.refresh_aggregate('${mvT.stripPrefix("lake.")}')")
    def mvState(): Seq[(String, Long, Double, Double, Double)] = spark.table(mvT)
      .select(col("g"), col("cnt"), col("sum_v").cast("double"), col("min_v"), col("max_v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(mvState() == Seq(("a", 2L, 4.0, 1.5, 2.5), ("b", 1L, 10.0, 10.0, 10.0)))

    // second load touches one existing group and one new group; the new
    // 'a' row extends min but not max
    spark.sql(s"INSERT INTO $src VALUES ('a', 0.5), ('c', 7.0)")
    val res = spark.sql(s"CALL lake.system.refresh_aggregate('${mvT.stripPrefix("lake.")}')")
      .collect()(0)
    assert(res.getLong(0) == 2, "only the touched groups upsert")
    assert(mvState() == Seq(
      ("a", 3L, 4.5, 0.5, 2.5), ("b", 1L, 10.0, 10.0, 10.0), ("c", 1L, 7.0, 7.0, 7.0)))

    // equals from-scratch on the same source
    val scratch = spark.table(src).groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v").cast("decimal(18,6)")).cast("double").as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(mvState() == scratch)
    spark.sql(s"DROP TABLE $mvT"); spark.sql(s"DROP TABLE $src")
  }

  test("refresh with no new data is a no-op; watermark rides the upsert commit") {
    val src = s"lake.mvs.${uniq("nsrc")}"
    val mvT = s"lake.mvs.${uniq("nagg")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mvs")
    spark.sql(s"CREATE TABLE $src (g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $src VALUES ('x', 1.0)")
    Materialized.createAggregate(spark, mvT, src, Seq("g"), Seq("v"))
    val (g1, snap1) = Materialized.refresh(spark, mvT)
    assert(g1 == 1)
    // the watermark is IN the refresh snapshot's commit (atomic)
    val m = meta(mvT)
    assert(m.currentSnapshotId == snap1)
    assert(m.properties("mv.last-snapshot").toLong == meta(src).currentSnapshotId)
    // replay: nothing new -> no commit, no state change
    val (g2, snap2) = Materialized.refresh(spark, mvT)
    assert(g2 == 0 && snap2 == snap1, "idempotent refresh must not commit")
    assert(spark.table(mvT).count() == 1)
    spark.sql(s"DROP TABLE $mvT"); spark.sql(s"DROP TABLE $src")
  }

  test("partitioned MV: refresh keeps one file per group, point reads prune") {
    val src = s"lake.mvs.${uniq("psrc")}"
    val mvT = s"lake.mvs.${uniq("pagg")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mvs")
    spark.sql(s"CREATE TABLE $src (g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $src VALUES ('a', 1.0), ('b', 2.0), ('c', 3.0)")
    Materialized.createAggregate(spark, mvT, src, Seq("g"), Seq("v"), partitioned = true)
    Materialized.refresh(spark, mvT)
    spark.sql(s"INSERT INTO $src VALUES ('a', 4.0)")
    Materialized.refresh(spark, mvT)
    val files = meta(mvT).currentFiles
    assert(files.forall(f => f.minValues.get("g") == f.maxValues.get("g")),
      "clustered refresh: every MV file single-valued on the group")
    // a one-group read prunes to that group's files
    val q = spark.table(mvT).filter(col("g") === "b")
    assert(q.count() == 1)
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    val m = """LakeScan\([^,]+, (\d+) files\)""".r.findFirstMatchIn(scanned)
    assert(m.isDefined && m.get.group(1).toInt < files.size,
      s"point read must prune to a subset of ${files.size} files:\n$scanned")
    // values still exact through the partitioned upsert path
    val a = spark.table(mvT).filter(col("g") === "a").head()
    assert(a.getAs[Long]("cnt") == 2 &&
      a.getAs[java.math.BigDecimal]("sum_v").doubleValue() == 5.0)
    spark.sql(s"DROP TABLE $mvT"); spark.sql(s"DROP TABLE $src")
  }

  test("racing refreshes fold the delta exactly once (watermark precondition)") {
    val src = s"lake.mvs.${uniq("csrc")}"
    val mvT = s"lake.mvs.${uniq("cagg")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mvs")
    spark.sql(s"CREATE TABLE $src (g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $src VALUES ('a', 1.0)")
    Materialized.createAggregate(spark, mvT, src, Seq("g"), Seq("v"))
    Materialized.refresh(spark, mvT)
    spark.sql(s"INSERT INTO $src VALUES ('a', 2.0), ('b', 5.0)")

    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    import scala.util.Try
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val outcomes = Await.result(
      Future.sequence(Seq(
        Future(Try(Materialized.refresh(spark, mvT))),
        Future(Try(Materialized.refresh(spark, mvT))))), 120.seconds)
    pool.shutdown()
    // every outcome is a success, a no-op, or the loser's conflict — never
    // a double-fold
    outcomes.foreach {
      case scala.util.Failure(e) =>
        assert(e.isInstanceOf[graft.catalog.CommitConflictException],
          s"unexpected refresh failure: $e")
      case _ => ()
    }
    val got = spark.table(mvT)
      .select(col("g"), col("cnt"), col("sum_v").cast("double"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 2L, 3.0), ("b", 1L, 5.0)),
      s"the delta must fold exactly once regardless of the race, got $got")
    spark.sql(s"DROP TABLE $mvT"); spark.sql(s"DROP TABLE $src")
  }

  test("rewritten source history in the delta range fails fast (honesty rule)") {
    val src = s"lake.mvs.${uniq("rsrc")}"
    val mvT = s"lake.mvs.${uniq("ragg")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mvs")
    spark.sql(s"CREATE TABLE $src (g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $src VALUES ('x', 1.0)")
    Materialized.createAggregate(spark, mvT, src, Seq("g"), Seq("v"))
    Materialized.refresh(spark, mvT)
    spark.sql(s"INSERT INTO $src VALUES ('x', 2.0)")
    spark.sql(s"INSERT INTO $src VALUES ('y', 3.0)")
    LakeMaintenance.compact(spark, src) // rewrite inside the pending range
    // the range routes to the changelog path (non-append ops present),
    // which fails fast on the rewrite it cannot express as row changes
    val e = intercept[Exception] { Materialized.refresh(spark, mvT) }
    assert(e.getMessage.contains("not expressible"),
      s"refresh over rewritten history must fail fast, got: ${e.getMessage}")
    spark.sql(s"DROP TABLE $mvT"); spark.sql(s"DROP TABLE $src")
  }

  test("refresh folds UPSERT source deltas by retraction (signed changelog)") {
    val src = s"lake.mvs.${uniq("usrc")}"
    val mvT = s"lake.mvs.${uniq("uagg")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mvs")
    spark.sql(s"CREATE TABLE $src (k BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $src SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, " +
      "CAST(id AS DOUBLE) FROM range(0, 100)")
    Materialized.createAggregate(spark, mvT, src, Seq("g"), Seq("v"))
    Materialized.refresh(spark, mvT)
    // upsert epoch: 25 keys move from group parity unchanged but values
    // change; 10 brand-new keys arrive in 'b'
    spark.sql(s"SELECT id AS k, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g, " +
      s"CAST(id * 10 AS DOUBLE) AS v FROM range(0, 25)")
      .createOrReplaceTempView("mv_ups1")
    spark.sql(s"CALL lake.system.upsert('${src.stripPrefix("lake.")}', 'mv_ups1', 'k')")
    // MoR DELETE also rides the changelog path
    spark.sql(s"ALTER TABLE $src SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"DELETE FROM $src WHERE k >= 90")
    Materialized.refresh(spark, mvT)
    // from-scratch truth
    val want = spark.table(src).groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(18,6)")).as("sum_v"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val got = spark.table(mvT).where("cnt > 0").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    assert(got.sameElements(want), s"mv=${got.toSeq} scratch=${want.toSeq}")
    // replay is a no-op (watermark moved)
    assert(Materialized.refresh(spark, mvT)._1 == 0L)
    spark.sql(s"DROP TABLE $mvT"); spark.sql(s"DROP TABLE $src")
  }

  test("refresh with min/max over an upsert source recomputes touched groups; vanished group gets cnt=0") {
    val src = s"lake.mvs.${uniq("msrc")}"
    val mvT = s"lake.mvs.${uniq("magg")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mvs")
    spark.sql(s"CREATE TABLE $src (k BIGINT, g STRING, v DOUBLE) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $src SELECT id, CASE WHEN id < 10 THEN 'solo' ELSE 'big' END, " +
      "CAST(id AS DOUBLE) FROM range(0, 100)")
    Materialized.createAggregate(spark, mvT, src, Seq("g"), Seq("v"),
      minCols = Seq("v"), maxCols = Seq("v"))
    Materialized.refresh(spark, mvT)
    // the max of 'big' (k=99) is deleted — a monotone merge would keep the
    // stale max; the recompute path must not
    spark.sql(s"DELETE FROM $src WHERE k >= 95")
    // and group 'solo' vanishes entirely
    spark.sql(s"DELETE FROM $src WHERE g = 'solo'")
    Materialized.refresh(spark, mvT)
    val rows = spark.table(mvT).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("min_v"), r.getAs[Double]("max_v"))).toMap
    assert(rows("big") == ((85L, 10.0, 94.0)), s"got ${rows.get("big")}")
    assert(rows("solo")._1 == 0L, s"vanished group must carry cnt=0, got ${rows.get("solo")}")
    // untouched-group invariant: a later append touching only 'big' leaves
    // 'solo' alone and the fast path resumes (append-only tail)
    spark.sql(s"INSERT INTO $src VALUES (200, 'big', 1000.0)")
    Materialized.refresh(spark, mvT)
    val rows2 = spark.table(mvT).where("cnt > 0").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("min_v"), r.getAs[Double]("max_v"))).toMap
    assert(rows2 == Map("big" -> ((86L, 10.0, 1000.0))), s"got $rows2")
    spark.sql(s"DROP TABLE $mvT"); spark.sql(s"DROP TABLE $src")
  }
}
