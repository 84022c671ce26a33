package graft

import org.scalatest.funsuite.AnyFunSuite

/** Branches: named writable refs (round 6). A branch write advances
  * `branch.<name>` through the same CAS pointer swap as every commit while
  * the main pointer stays put; reads follow the branch by name; expiration
  * keeps branch heads alive; fast_forward merges an un-diverged branch.
  */
class BranchSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  test("branch write isolates from main; branch reads see it; fast_forward merges") {
    val t = s"lake.br.${uniq("wi")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.br")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k, CAST(id AS STRING) AS v FROM range(0, 100)")
    spark.sql(s"CALL lake.system.create_branch('$short', 'audit')")

    // write TO the branch
    spark.sql("SELECT id AS k, concat('b', id) AS v FROM range(100, 150)")
      .toDF("k", "v").writeTo(t).option("branch", "audit").append()

    // main unchanged; branch sees 150 via option AND via VERSION AS OF
    assert(spark.table(t).count() == 100)
    assert(spark.read.option("branch", "audit").table(t).count() == 150)
    val br = spark.sql(s"SELECT count(*) AS n FROM $t VERSION AS OF 'audit'").collect()(0)
    assert(br.getLong(0) == 150)

    // second branch write chains on the branch head
    spark.sql("SELECT id AS k, concat('c', id) AS v FROM range(150, 160)")
      .toDF("k", "v").writeTo(t).option("branch", "audit").append()
    assert(spark.read.option("branch", "audit").table(t).count() == 160)
    assert(spark.table(t).count() == 100)

    // fast_forward: main jumps to the branch head
    spark.sql(s"CALL lake.system.fast_forward('$short', 'audit')")
    assert(spark.table(t).count() == 160)
    assert(spark.table(t).where("v LIKE 'c%'").count() == 10)
    spark.sql(s"DROP TABLE $t")
  }

  test("fast_forward refuses a diverged main; branch survives expiration") {
    val t = s"lake.br.${uniq("dv")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.br")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 10)")
    spark.sql(s"CALL lake.system.create_branch('$short', 'side')")
    spark.sql("SELECT id AS k FROM range(10, 20)")
      .toDF("k").writeTo(t).option("branch", "side").append()
    // main diverges
    spark.sql(s"INSERT INTO $t SELECT id FROM range(100, 105)")
    val e = intercept[Exception] {
      spark.sql(s"CALL lake.system.fast_forward('$short', 'side')")
    }
    assert(e.getMessage.contains("not an ancestor"))

    // expiration keeps the branch head readable
    spark.sql(s"CALL lake.system.expire_snapshots('$short', 1)")
    assert(spark.read.option("branch", "side").table(t).count() == 20)
    assert(spark.table(t).count() == 15)
    spark.sql(s"DROP TABLE $t")
  }

  test("cherrypick_snapshot: one diverged-branch commit applies onto main, branch untouched") {
    val t = s"lake.br.${uniq("cp")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.br")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 10)")
    spark.sql(s"CALL lake.system.create_branch('$short', 'side')")
    // two branch commits
    spark.sql("SELECT id AS k FROM range(10, 20)")
      .toDF("k").writeTo(t).option("branch", "side").append()
    val firstBranchCommit = {
      import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
      val lt = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
        .loadTable(Identifier.of(Array("br"), short.stripPrefix("br.")))
        .asInstanceOf[graft.catalog.LakeTable]
      lt.meta.branchHead("side").get
    }
    spark.sql("SELECT id AS k FROM range(20, 30)")
      .toDF("k").writeTo(t).option("branch", "side").append()
    // main diverges -> fast_forward is off the table
    spark.sql(s"INSERT INTO $t SELECT id FROM range(100, 105)")
    assert(intercept[Exception] {
      spark.sql(s"CALL lake.system.fast_forward('$short', 'side')")
    }.getMessage.contains("not an ancestor"))

    // cherry-pick ONLY the first branch commit onto main
    spark.sql(s"CALL lake.system.cherrypick_snapshot('$short', $firstBranchCommit)")
    val mainKeys = spark.table(t).collect().map(_.getLong(0)).toSet
    assert(mainKeys == ((0L until 10L) ++ (10L until 20L) ++ (100L until 105L)).toSet,
      s"main = original + diverged insert + first branch epoch, got ${mainKeys.toSeq.sorted}")
    // the branch still sees its own full lineage, nothing more
    assert(spark.read.option("branch", "side").table(t).count() == 30)

    // a rewrite (compaction) snapshot is NOT cherry-pickable
    spark.sql(s"CALL lake.system.compact('$short')")
    val compacted = {
      import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
      val lt = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
        .loadTable(Identifier.of(Array("br"), short.stripPrefix("br.")))
        .asInstanceOf[graft.catalog.LakeTable]
      lt.meta.currentSnapshotId
    }
    assert(intercept[Exception] {
      spark.sql(s"CALL lake.system.cherrypick_snapshot('$short', $compacted)")
    }.getMessage.contains("not an append"))
    spark.sql(s"DROP TABLE $t")
  }

  test("cherrypick races a concurrent main writer: both commits land, nothing lost") {
    val t = s"lake.br.${uniq("cr")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.br")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 10)")
    spark.sql(s"CALL lake.system.create_branch('$short', 'side')")
    spark.sql("SELECT id AS k FROM range(10, 20)")
      .toDF("k").writeTo(t).option("branch", "side").append()
    spark.sql(s"INSERT INTO $t SELECT id FROM range(100, 105)") // diverge main
    val branchHead = {
      import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
      spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
        .loadTable(Identifier.of(Array("br"), short.stripPrefix("br.")))
        .asInstanceOf[graft.catalog.LakeTable].meta.branchHead("side").get
    }
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val puller = Future {
      graft.catalog.LakeMaintenance.cherrypick(spark, t, branchHead)
    }
    val writer = Future {
      spark.sql(s"INSERT INTO $t SELECT id FROM range(200, 203)")
    }
    Await.result(Future.sequence(Seq(puller.map(_ => ()), writer.map(_ => ()))), 120.seconds)
    pool.shutdown()
    val keys = spark.table(t).collect().map(_.getLong(0)).toSet
    val expected = ((0L until 10L) ++ (10L until 20L) ++ (100L until 105L) ++ (200L until 203L)).toSet
    assert(keys == expected, s"both racing commits must land exactly once, got ${keys.toSeq.sorted}")
    spark.sql(s"DROP TABLE $t")
  }

  test("$refs lists main, tags and branches; remove_branch deletes the ref only") {
    val t = s"lake.br.${uniq("refs")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.br")
    spark.sql(s"CREATE TABLE $t AS SELECT id FROM range(0, 5)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(5, 9)")
    spark.sql(s"CALL lake.system.create_tag('$short', 'v1', 1)")
    spark.sql(s"CALL lake.system.create_branch('$short', 'dev')")

    val name = t.split('.').last
    val refs = spark.sql(s"SELECT * FROM lake.br.`$name$$refs`").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(refs.contains(("main", "branch", 2L)))
    assert(refs.contains(("v1", "tag", 1L)))
    assert(refs.contains(("dev", "branch", 2L)))

    // ref-name namespace is shared: a tag can't shadow a branch or vice versa
    intercept[Exception] { spark.sql(s"CALL lake.system.create_tag('$short', 'dev')") }
    intercept[Exception] { spark.sql(s"CALL lake.system.create_branch('$short', 'v1')") }

    spark.sql(s"CALL lake.system.remove_branch('$short', 'dev')")
    assert(!spark.sql(s"SELECT * FROM lake.br.`$name$$refs`").collect()
      .exists(_.getString(0) == "dev"))
    // table data untouched
    assert(spark.table(t).count() == 9)
    spark.sql(s"DROP TABLE $t")
  }

  test("$history marks current-pointer ancestry; branch commits show false until merged") {
    val t = s"lake.br.${uniq("hist")}"
    val short = t.stripPrefix("lake.")
    val name = t.split('.').last
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.br")
    spark.sql(s"CREATE TABLE $t AS SELECT id FROM range(0, 5)") // snap 1
    spark.sql(s"INSERT INTO $t SELECT id FROM range(5, 9)") // snap 2
    spark.sql(s"CALL lake.system.create_branch('$short', 'h')")
    spark.sql("SELECT id FROM range(9, 12)").toDF("id")
      .writeTo(t).option("branch", "h").append() // snap 3, off-main

    def hist(): Map[Long, (Long, Boolean)] =
      spark.sql(s"SELECT * FROM lake.br.`$name$$history` ORDER BY snapshot_id").collect()
        .map(r => r.getLong(1) -> (r.getLong(2), r.getBoolean(4))).toMap
    val h1 = hist()
    assert(h1(1L)._2 && h1(2L)._2, "main lineage is current-ancestor")
    assert(!h1(3L)._2, "unmerged branch commit is not")
    assert(h1(3L)._1 == 2L, "branch commit chains from the branch head")

    spark.sql(s"CALL lake.system.fast_forward('$short', 'h')")
    val h2 = hist()
    assert(h2(3L)._2, "after fast_forward the branch commit joins the lineage")
    spark.sql(s"DROP TABLE $t")
  }

  test("live race: branch writer vs main writer vs second branch, all land") {
    val t = s"lake.br.${uniq("live")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.br")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 10)")
    spark.sql(s"CALL lake.system.create_branch('$short', 'x')")
    spark.sql(s"CALL lake.system.create_branch('$short', 'y')")

    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val jobs: Seq[() => Unit] = Seq(
      () => spark.sql("SELECT id AS k FROM range(100, 150)").toDF("k")
        .writeTo(t).option("branch", "x").append(),
      () => spark.sql(s"INSERT INTO $t SELECT id FROM range(200, 230)"),
      () => spark.sql("SELECT id AS k FROM range(300, 320)").toDF("k")
        .writeTo(t).option("branch", "y").append())
    val threads = jobs.map(j => new Thread(() =>
      try j() catch { case e: Throwable => errs.add(e) }))
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"all three racing commits must land: ${errs.toArray.mkString}")

    assert(spark.table(t).count() == 40) // 10 base + 30 main insert
    assert(spark.read.option("branch", "x").table(t).count() == 60) // 10 + 50
    assert(spark.read.option("branch", "y").table(t).count() == 30) // 10 + 20
    spark.sql(s"DROP TABLE $t")
  }

  test("branch append rebases over a concurrent main commit (CAS retry keeps both)") {
    val t = s"lake.br.${uniq("race")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.br")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 10)")
    spark.sql(s"CALL lake.system.create_branch('$short', 'b1')")
    // interleave: branch write, main write, branch write
    spark.sql("SELECT id AS k FROM range(10, 20)").toDF("k")
      .writeTo(t).option("branch", "b1").append()
    spark.sql(s"INSERT INTO $t SELECT id FROM range(1000, 1005)")
    spark.sql("SELECT id AS k FROM range(20, 30)").toDF("k")
      .writeTo(t).option("branch", "b1").append()
    // branch lineage: base 10 + two branch appends (main's insert not included)
    assert(spark.read.option("branch", "b1").table(t).count() == 30)
    // main lineage: base 10 + its insert
    assert(spark.table(t).count() == 15)
    spark.sql(s"DROP TABLE $t")
  }

  test("incremental batch read follows main's lineage past concurrent branch commits and rewrite_manifests") {
    import spark.implicits._
    val t = s"lake.br.${uniq("ib")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.br")
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)") // snapshot A (start)
    val startId = {
      val Array(_, ns, name) = t.split('.')
      val c = spark.sessionState.catalogManager.catalog("lake")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      c.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name))
        .asInstanceOf[graft.catalog.LakeTable].meta.currentSnapshotId
    }
    // branch commits INTERLEAVE with main appends — their snapshot ids land
    // inside main's id range but outside its lineage
    spark.sql(s"CALL lake.system.create_branch('$short', 'side')")
    Seq(100L).toDF("k").writeTo(t).option("branch", "side").append()
    spark.sql(s"INSERT INTO $t VALUES (2)")
    Seq(101L).toDF("k").writeTo(t).option("branch", "side").append()
    spark.sql(s"CALL lake.system.rewrite_manifests('$short')")
    spark.sql(s"INSERT INTO $t VALUES (3)")
    val delta = spark.read.option("start-snapshot-id", startId.toString).table(t)
    assert(delta.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L),
      "main's incremental delta: its own appends only, no branch rows, no spurious failure")
    spark.sql(s"DROP TABLE $t")
  }
}
