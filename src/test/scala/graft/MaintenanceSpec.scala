package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.LakeMaintenance

/** Metadata/file-hygiene maintenance: manifest bin-packing and orphan-file
  * removal. Both matter only at scale (thousands of commits, failed-job
  * debris) but their invariants — nothing user-visible changes — are
  * testable at any size.
  */
class MaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private def tableLoc(ns: String, name: String): String =
    spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array(ns), name)).asInstanceOf[graft.catalog.LakeTable].meta.location

  private def manifestCount(ns: String, name: String): Long =
    spark.sql(s"SELECT * FROM lake.$ns.`$name$$manifests`").count()

  test("rewrite_manifests bin-packs per-commit manifests; values, stats pruning and time travel survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.rm")
    spark.sql("CREATE TABLE lake.maint.rm (k INT, v STRING)")
    for (i <- 0 until 6)
      spark.sql(s"INSERT INTO lake.maint.rm SELECT id AS k, 'b$i' AS v " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    assert(manifestCount("maint", "rm") == 6) // one manifest per append
    val before = spark.table("lake.maint.rm").orderBy("k").collect()

    val res = spark.sql("CALL lake.system.rewrite_manifests('maint.rm')").collect().head
    assert(res.getInt(0) == 6 && res.getInt(1) == 1)
    assert(manifestCount("maint", "rm") == 1)

    // rows byte-identical; per-file min/max stats still prune
    assert(spark.table("lake.maint.rm").orderBy("k").collect().sameElements(before))
    assert(spark.sql("SELECT * FROM lake.maint.rm WHERE k > 5000").count() == 0)
    assert(spark.sql("SELECT count(*) FROM lake.maint.rm WHERE k >= 500")
      .collect().head.getLong(0) == 100)
    // time travel to a pre-rewrite snapshot still resolves the old manifests
    assert(spark.sql("SELECT * FROM lake.maint.rm VERSION AS OF 2").count() == 200)
    // the rewrite is its own snapshot in history
    val ops = LakeMaintenance.history(spark, "lake.maint.rm")
      .collect().map(_.getString(2))
    assert(ops.count(_ == "rewrite-manifests") == 1)
  }

  test("rewrite_manifests with nothing to merge is a no-op (no commit)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.rm1")
    spark.sql("CREATE TABLE lake.maint.rm1 AS SELECT id AS k FROM range(0, 10)")
    val snaps = LakeMaintenance.history(spark, "lake.maint.rm1").count()
    assert(LakeMaintenance.rewriteManifests(spark, "lake.maint.rm1") == ((1, 1)))
    assert(LakeMaintenance.history(spark, "lake.maint.rm1").count() == snaps)
  }

  test("rewrite_manifests preserves eq-delete sequence applicability (no resurrection)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.rmu")
    spark.sql("CREATE TABLE lake.maint.rmu AS SELECT id AS k, 'base' AS v FROM range(0, 50)")
    spark.sql("SELECT id AS k, 'e1' AS v FROM range(0, 25)").createOrReplaceTempView("rmu_s1")
    spark.sql("CALL lake.system.upsert('maint.rmu', 'rmu_s1', 'k')")
    spark.sql("SELECT id AS k, 'e2' AS v FROM range(10, 60)").createOrReplaceTempView("rmu_s2")
    spark.sql("CALL lake.system.upsert('maint.rmu', 'rmu_s2', 'k')")
    val want = spark.table("lake.maint.rmu").orderBy("k").collect()
    assert(want.length == 60)

    val res = spark.sql("CALL lake.system.rewrite_manifests('maint.rmu')").collect().head
    assert(res.getInt(1) < res.getInt(0))
    // merged manifests carry the original addedAt stamps: each eq-delete
    // still kills exactly the strictly-older versions of its keys
    assert(spark.table("lake.maint.rmu").orderBy("k").collect().sameElements(want))
    // CDC changelog walks straight through the rewrite-manifests snapshot
    val t = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("maint"), "rmu")).asInstanceOf[graft.catalog.LakeTable]
    val end = t.meta.currentSnapshotId
    val log = LakeMaintenance.changelog(spark, "lake.maint.rmu", 0L, end)
    // inserts: 50 base + 25 e1 + 50 e2; deletes: 25 (e1 over base) + 40 (e2
    // over the live versions of keys 10..49); rewrite itself adds zero
    assert(log.where("_change_type = 'insert'").count() == 125)
    assert(log.where("_change_type = 'delete'").count() == 65)
    // and compaction after the rewrite still folds everything correctly
    LakeMaintenance.compact(spark, "lake.maint.rmu")
    assert(spark.table("lake.maint.rmu").orderBy("k").collect().sameElements(want))
  }

  test("commit-time manifest merge keeps metadata bounded over many appends") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.am")
    spark.sql("CREATE TABLE lake.maint.am (k INT) " +
      "TBLPROPERTIES ('commit.manifest-merge.min-count'='8')")
    for (i <- 0 until 20) spark.sql(s"INSERT INTO lake.maint.am VALUES ($i)")
    // without the merge this would be 20 manifests; the threshold caps it
    assert(manifestCount("maint", "am") <= 8)
    assert(spark.table("lake.maint.am").collect().map(_.getInt(0)).sorted
      .sameElements(0 until 20))
    // a pre-merge snapshot still resolves through its own (unmerged) list
    assert(spark.sql("SELECT * FROM lake.maint.am VERSION AS OF 5").count() == 5)
  }

  test("commit-time manifest merge opts out by table property") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.am0")
    spark.sql("CREATE TABLE lake.maint.am0 (k INT) " +
      "TBLPROPERTIES ('commit.manifest-merge.enabled'='false', " +
      "'commit.manifest-merge.min-count'='4')")
    for (i <- 0 until 8) spark.sql(s"INSERT INTO lake.maint.am0 VALUES ($i)")
    assert(manifestCount("maint", "am0") == 8) // one per commit, untouched
  }

  test("scoped compact: WHERE limits the rewrite to matching partitions' files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mx")
    spark.sql("DROP TABLE IF EXISTS lake.mx.scoped")
    spark.sql("CREATE TABLE lake.mx.scoped (p INT, v BIGINT) PARTITIONED BY (p)")
    // several small files per partition (separate INSERTs)
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO lake.mx.scoped VALUES (1, $i), (2, ${i + 10})"))
    def files(): Seq[graft.catalog.DataFileMeta] = {
      import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
      spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
        .loadTable(Identifier.of(Array("mx"), "scoped"))
        .asInstanceOf[graft.catalog.LakeTable].meta.currentFiles
    }
    val before = files()
    val coldPaths = before.filter(_.minValues.get("p").contains("2")).map(_.path).toSet
    assert(before.count(_.minValues.get("p").contains("1")) == 3 && coldPaths.size == 3)

    spark.sql("CALL lake.system.compact('mx.scoped', where => 'p = 1')")
    val after = files()
    // hot partition merged to one file; cold partition's files untouched
    assert(after.count(_.minValues.get("p").contains("1")) == 1,
      s"p=1 should compact to one file, got ${after.map(_.path)}")
    assert(after.filter(_.minValues.get("p").contains("2")).map(_.path).toSet == coldPaths,
      "files outside the WHERE scope must not be rewritten")
    // rows intact
    assert(spark.table("lake.mx.scoped").count() == 6)
    // unscoped compact still merges the rest
    spark.sql("CALL lake.system.compact('mx.scoped')")
    assert(files().count(_.minValues.get("p").contains("2")) == 1)
    assert(spark.table("lake.mx.scoped").count() == 6)
    spark.sql("DROP TABLE lake.mx.scoped")
  }

  test("partial-progress compact: bounded batches, independent commits, deletes fold by the last round") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mx")
    spark.sql("DROP TABLE IF EXISTS lake.mx.pp")
    spark.sql("CREATE TABLE lake.mx.pp (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    // 9 small files + positional tombstones across several of them
    (0 until 9).foreach(i => spark.sql(
      s"INSERT INTO lake.mx.pp SELECT /*+ REPARTITION(1) */ id, concat('v', id) " +
        s"FROM range(${i * 100}, ${i * 100 + 100})"))
    spark.sql("DELETE FROM lake.mx.pp WHERE k % 17 = 0")
    val expect = spark.table("lake.mx.pp").orderBy("k").collect().toSeq
    val snapsBefore = spark.sql("SELECT count(*) FROM lake.mx.`pp$snapshots`").head().getLong(0)

    val r = spark.sql(
      "CALL lake.system.compact('mx.pp', max_files_per_commit => 4)").head()
    assert(r.getInt(0) == 9, s"files_before: $r")
    assert(r.getInt(1) < 9, s"files_after: $r")
    // 9 small files at <=4 per round = at least 3 INDEPENDENT compact commits
    val compacts = spark.sql(
      "SELECT count(*) FROM lake.mx.`pp$snapshots` WHERE operation = 'compact'")
      .head().getLong(0)
    assert(compacts >= 3, s"expected >= 3 partial-progress commits, got $compacts")
    assert(spark.sql("SELECT count(*) FROM lake.mx.`pp$snapshots`").head().getLong(0)
      > snapsBefore + 2)
    // all tombstones folded by the end (every dirty file was rewritten)
    assert(spark.sql("SELECT count(*) FROM lake.mx.`pp$deletes`").head().getLong(0) == 0,
      "all delete files must fold once their targets are rewritten")
    // values identical to the pre-compaction state
    assert(spark.table("lake.mx.pp").orderBy("k").collect().toSeq == expect)
    // a later call may still merge the (small) round outputs; once one
    // file remains, compact converges to a no-op — no self-churn loop
    spark.sql("CALL lake.system.compact('mx.pp', max_files_per_commit => 4)")
    val r3 = spark.sql(
      "CALL lake.system.compact('mx.pp', max_files_per_commit => 4)").head()
    assert(r3.getInt(0) == r3.getInt(1), s"compact must converge to a no-op: $r3")
    assert(spark.table("lake.mx.pp").orderBy("k").collect().toSeq == expect)
    spark.sql("DROP TABLE lake.mx.pp")
  }

  test("expire_snapshots older_than_ms: young snapshots survive keep_last counting") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mx")
    spark.sql("DROP TABLE IF EXISTS lake.mx.age")
    spark.sql("CREATE TABLE lake.mx.age (k BIGINT)")
    spark.sql("INSERT INTO lake.mx.age VALUES (1)")
    Thread.sleep(5)
    def meta() = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("mx"), "age")).asInstanceOf[graft.catalog.LakeTable].meta
    val cutoff = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql("INSERT INTO lake.mx.age VALUES (2)")
    spark.sql("INSERT INTO lake.mx.age VALUES (3)")
    val beforeIds = meta().snapshots.map(_.snapshotId).sorted
    // keep_last=1 alone would drop all but the head; the age guard keeps
    // every snapshot committed after the cutoff
    spark.sql(s"CALL lake.system.expire_snapshots('mx.age', 1, ${cutoff}L)")
    val after = meta().snapshots.map(_.snapshotId).sorted
    assert(after == beforeIds.drop(1),
      s"only the pre-cutoff history should expire: before=$beforeIds after=$after")
    assert(spark.table("lake.mx.age").count() == 3)
    spark.sql("DROP TABLE lake.mx.age")
  }

  test("remove_orphan_files deletes only unreferenced debris; history and current doc survive") {
    import org.apache.hadoop.fs.Path
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.orph")
    spark.sql("CREATE TABLE lake.maint.orph AS SELECT id AS k FROM range(0, 100)")
    spark.sql("INSERT INTO lake.maint.orph SELECT id AS k FROM range(100, 200)")
    val before = spark.table("lake.maint.orph").orderBy("k").collect()

    val t = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("maint"), "orph")).asInstanceOf[graft.catalog.LakeTable]
    val loc = t.meta.location
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(loc).getFileSystem(conf)
    // debris: a failed write's data file + a stray tmp in metadata/
    val junkData = new Path(s"$loc/data/part-junk-${java.util.UUID.randomUUID()}.parquet")
    val junkMeta = new Path(s"$loc/metadata/tmp-${java.util.UUID.randomUUID()}.json")
    Seq(junkData, junkMeta).foreach { p =>
      val out = fs.create(p, false); out.write(1); out.close()
    }

    // dry run: finds the debris, deletes nothing (negative age = no grace)
    val (dryDel, dryFound) =
      LakeMaintenance.removeOrphanFiles(spark, "lake.maint.orph", -60000L, dryRun = true)
    assert(dryDel >= 2 && dryFound >= 2)
    assert(fs.exists(junkData) && fs.exists(junkMeta))

    val (del, _) = LakeMaintenance.removeOrphanFiles(spark, "lake.maint.orph", -60000L)
    assert(del >= 2)
    assert(!fs.exists(junkData) && !fs.exists(junkMeta))
    // every referenced artifact survives: values, history, metadata doc
    assert(spark.table("lake.maint.orph").orderBy("k").collect().sameElements(before))
    assert(spark.sql("SELECT * FROM lake.maint.orph VERSION AS OF 1").count() == 100)
    spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[graft.catalog.LakeCatalog]
      .invalidateTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("maint"), "orph"))
    assert(spark.table("lake.maint.orph").count() == 200)
  }

  test("remove_orphan_files age cutoff protects in-flight writers' fresh files") {
    import org.apache.hadoop.fs.Path
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.orph2")
    spark.sql("CREATE TABLE lake.maint.orph2 AS SELECT id AS k FROM range(0, 10)")
    val t = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("maint"), "orph2")).asInstanceOf[graft.catalog.LakeTable]
    val conf = spark.sessionState.newHadoopConf()
    val inflight = new Path(s"${t.meta.location}/data/inflight-${java.util.UUID.randomUUID()}.parquet")
    val fs = inflight.getFileSystem(conf)
    val out = fs.create(inflight, false); out.write(1); out.close()
    // default-style grace period: the just-written (uncommitted) file is
    // unreferenced but too young to touch
    val (del, found) = LakeMaintenance.removeOrphanFiles(spark, "lake.maint.orph2", 3600000L)
    assert(del == 0 && found >= 1)
    assert(fs.exists(inflight))
    fs.delete(inflight, false)
  }

  test("add_files imports external parquet by reference: metadata-only commit, exact values, stats prune") {
    import org.apache.hadoop.fs.Path
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.af")
    val ext = java.nio.file.Files.createTempDirectory("graft_addfiles").toString
    // two range-disjoint files so min/max stats can prune one of them
    spark.sql("SELECT id AS k, concat('v', id) AS v FROM range(0, 1000)")
      .repartitionByRange(2, org.apache.spark.sql.functions.col("k"))
      .write.mode("overwrite").parquet(ext)
    spark.sql("CREATE TABLE lake.maint.af (k BIGINT, v STRING)")
    val res = spark.sql(s"CALL lake.system.add_files('maint.af', '$ext')").collect().head
    assert(res.getInt(0) == 2, s"expected 2 files added, got ${res.getInt(0)}")

    // metadata-only: every tracked file is the EXTERNAL path — nothing was
    // copied under the table location
    val tracked = spark.sql("SELECT path FROM lake.maint.`af$files`")
      .collect().map(_.getString(0))
    assert(tracked.length == 2 && tracked.forall(_.contains(ext))) // file:-qualified

    // exact values through the normal scan, mixed with a native append
    assert(spark.table("lake.maint.af").count() == 1000)
    assert(spark.sql("SELECT sum(k) FROM lake.maint.af").collect().head.getLong(0) == 499500L)
    assert(spark.sql("SELECT v FROM lake.maint.af WHERE k = 123").collect()
      .head.getString(0) == "v123")
    spark.sql("INSERT INTO lake.maint.af VALUES (5000, 'native')")
    assert(spark.table("lake.maint.af").count() == 1001)

    // footer-harvested min/max prune: k < 100 hits exactly ONE of the three
    // files (two range-disjoint imports + the k=5000 native file)
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val pruned = spark.table("lake.maint.af").where("k < 100")
    assert(pruned.count() == 100)
    val parts = pruned.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.flatMap(_.inputPartitions)
    assert(parts.size == 1, s"stats should prune to 1 file, planned ${parts.size}")

    // lifecycle safety: compaction rewrites the imports into native files,
    // expiration then drops the import snapshot — but NEVER deletes the
    // external source data (it was imported by reference)
    spark.sql("CALL lake.system.compact('maint.af')")
    spark.sql("CALL lake.system.expire_snapshots('maint.af', 1)")
    val fs = new Path(ext).getFileSystem(spark.sessionState.newHadoopConf())
    assert(tracked.forall(p => fs.exists(new Path(p))),
      "expiration must not delete externally-imported source files")
    assert(spark.table("lake.maint.af").count() == 1001)
    assert(spark.sql("SELECT v FROM lake.maint.af WHERE k = 123").collect()
      .head.getString(0) == "v123")
    spark.sql("DROP TABLE lake.maint.af")
  }

  test("add_files gates: schema mismatch, unknown column, double-add all rejected") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.afg")
    spark.sql("CREATE TABLE lake.maint.afg (k BIGINT, v STRING)")
    val okDir = java.nio.file.Files.createTempDirectory("graft_af_ok").toString
    spark.sql("SELECT id AS k, 'x' AS v FROM range(0, 10)").coalesce(1)
      .write.mode("overwrite").parquet(okDir)

    // type mismatch: k as DOUBLE
    val badType = java.nio.file.Files.createTempDirectory("graft_af_bad1").toString
    spark.sql("SELECT CAST(id AS DOUBLE) AS k, 'x' AS v FROM range(0, 10)").coalesce(1)
      .write.mode("overwrite").parquet(badType)
    val e1 = intercept[Exception](
      spark.sql(s"CALL lake.system.add_files('maint.afg', '$badType')"))
    assert(e1.getMessage.contains("in the files but"), e1.getMessage)

    // unknown column
    val badCol = java.nio.file.Files.createTempDirectory("graft_af_bad2").toString
    spark.sql("SELECT id AS k, 'x' AS v, id AS z FROM range(0, 10)").coalesce(1)
      .write.mode("overwrite").parquet(badCol)
    val e2 = intercept[Exception](
      spark.sql(s"CALL lake.system.add_files('maint.afg', '$badCol')"))
    assert(e2.getMessage.contains("not a table column"), e2.getMessage)

    // a failed add_files commits nothing
    assert(spark.table("lake.maint.afg").count() == 0)

    // double-add of the same path is rejected, and the table is unchanged
    spark.sql(s"CALL lake.system.add_files('maint.afg', '$okDir')")
    assert(spark.table("lake.maint.afg").count() == 10)
    val e3 = intercept[Exception](
      spark.sql(s"CALL lake.system.add_files('maint.afg', '$okDir')"))
    assert(e3.getMessage.contains("already tracked"), e3.getMessage)
    assert(spark.table("lake.maint.afg").count() == 10)
    spark.sql("DROP TABLE lake.maint.afg")
  }

  test("snapshot clone: zero-copy, isolated both ways, eq-delete sequence preserved") {
    import org.apache.hadoop.fs.Path
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.sc_src")
    spark.sql("DROP TABLE IF EXISTS lake.maint.sc_dst")
    spark.sql("""CREATE TABLE lake.maint.sc_src (k BIGINT, v STRING)
                |TBLPROPERTIES ('write.delete.mode'='merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO lake.maint.sc_src SELECT id, 'base' FROM range(0, 100)")
    // live state = base − MoR tombstones − upsert-overwritten versions
    spark.sql("DELETE FROM lake.maint.sc_src WHERE k >= 90")
    spark.sql("SELECT id AS k, 'e1' AS v FROM range(0, 30)")
      .createOrReplaceTempView("sc_up1")
    spark.sql("CALL lake.system.upsert('maint.sc_src', 'sc_up1', 'k')")
    val srcState = spark.table("lake.maint.sc_src").orderBy("k").collect()
    assert(srcState.length == 90)

    val res = spark.sql("CALL lake.system.snapshot('maint.sc_src', 'maint.sc_dst')")
      .collect().head
    assert(res.getLong(0) > 0)
    // the clone IS the source's live state, through tombstones and eq-deletes
    assert(spark.table("lake.maint.sc_dst").orderBy("k").collect().sameElements(srcState))

    // zero copy: the clone's data files live under the SOURCE's location
    val srcLoc = tableLoc("maint", "sc_src")
    val cloneFiles = spark.sql("SELECT path FROM lake.maint.`sc_dst$files`")
      .collect().map(_.getString(0))
    assert(cloneFiles.nonEmpty && cloneFiles.forall(_.startsWith(srcLoc)))

    // divergence is two-way invisible
    spark.sql("INSERT INTO lake.maint.sc_src VALUES (500, 'srconly')")
    assert(spark.table("lake.maint.sc_dst").count() == 90)
    spark.sql("SELECT id AS k, 'e2' AS v FROM range(0, 10)")
      .createOrReplaceTempView("sc_up2")
    spark.sql("CALL lake.system.upsert('maint.sc_dst', 'sc_up2', 'k')")
    // the clone's NEW eq-delete applies to the carried files (sequence
    // numbers stay ordered across the clone boundary)...
    val dv = spark.sql("SELECT v FROM lake.maint.sc_dst WHERE k = 5").collect()
    assert(dv.length == 1 && dv.head.getString(0) == "e2")
    // ...and the source never sees it
    assert(spark.sql("SELECT v FROM lake.maint.sc_src WHERE k = 5")
      .collect().head.getString(0) == "e1")
    assert(spark.table("lake.maint.sc_src").count() == 91)

    // clone maintenance never touches shared source data: compact rewrites
    // into the clone's location, expire drops the import snapshot — the
    // source's files stay on disk and the source still reads exactly
    spark.sql("CALL lake.system.compact('maint.sc_dst')")
    spark.sql("CALL lake.system.expire_snapshots('maint.sc_dst', 1)")
    val fs = new Path(srcLoc).getFileSystem(spark.sessionState.newHadoopConf())
    assert(cloneFiles.forall(p => fs.exists(new Path(p))),
      "clone maintenance must not delete the source's files")
    assert(spark.table("lake.maint.sc_src").orderBy("k").collect().length == 91)
    assert(spark.sql("SELECT v FROM lake.maint.sc_src WHERE k = 5")
      .collect().head.getString(0) == "e1")
    // post-maintenance clone: all files now under the clone's own location
    val cloneLoc = tableLoc("maint", "sc_dst")
    val after = spark.sql("SELECT path FROM lake.maint.`sc_dst$files`")
      .collect().map(_.getString(0))
    assert(after.nonEmpty && after.forall(_.startsWith(cloneLoc)))
    assert(spark.sql("SELECT v FROM lake.maint.sc_dst WHERE k = 5")
      .collect().head.getString(0) == "e2")
    spark.sql("DROP TABLE lake.maint.sc_src")
    spark.sql("DROP TABLE lake.maint.sc_dst")
  }

  test("snapshot clone of an empty table; clone over an existing name rejected") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.sc_e")
    spark.sql("DROP TABLE IF EXISTS lake.maint.sc_e2")
    spark.sql("CREATE TABLE lake.maint.sc_e (k INT, v STRING)")
    spark.sql("CALL lake.system.snapshot('maint.sc_e', 'maint.sc_e2')")
    assert(spark.table("lake.maint.sc_e2").count() == 0)
    spark.sql("INSERT INTO lake.maint.sc_e2 VALUES (1, 'a')")
    assert(spark.table("lake.maint.sc_e2").count() == 1)
    assert(spark.table("lake.maint.sc_e").count() == 0)
    val e = intercept[Exception](
      spark.sql("CALL lake.system.snapshot('maint.sc_e', 'maint.sc_e2')"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    spark.sql("DROP TABLE lake.maint.sc_e")
    spark.sql("DROP TABLE lake.maint.sc_e2")
  }

  private def tableMeta(ns: String, name: String): graft.catalog.TableMeta =
    spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array(ns), name)).asInstanceOf[graft.catalog.LakeTable].meta

  test("rewrite_delete_files: per-seq bin-pack + dead-key elimination, scans identical") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.rdf")
    spark.sql("CREATE TABLE lake.maint.rdf AS SELECT id AS k, 'base' AS v FROM range(0, 100)")
    // three upsert epochs, each fanned over 4 tasks → 4 eq-delete files per
    // epoch; epochs overlap so older epochs hold DEAD keys
    def epoch(name: String, lo: Int, hi: Int, tag: String): Unit = {
      spark.sql(s"SELECT id AS k, '$tag' AS v FROM range($lo, $hi)")
        .repartition(4).createOrReplaceTempView(name)
      spark.sql(s"CALL lake.system.upsert('maint.rdf', '$name', 'k')")
    }
    epoch("rdf_e1", 0, 41, "e1")   // seq 2
    epoch("rdf_e2", 20, 61, "e2")  // seq 3: keys 20-40 now dead in seq 2
    epoch("rdf_e3", 50, 71, "e3")  // seq 4: keys 50-60 now dead in seq 3
    val want = spark.table("lake.maint.rdf").orderBy("k").collect()
    val eqBefore = tableMeta("maint", "rdf").currentEqDeleteFiles
    assert(eqBefore.size == 12, s"expected 12 eq files, got ${eqBefore.size}")

    val res = spark.sql("CALL lake.system.rewrite_delete_files('maint.rdf')")
      .collect().head
    assert(res.getInt(0) == 12 && res.getInt(1) == 3, s"got $res")

    val eqAfter = tableMeta("maint", "rdf").currentEqDeleteFiles
    assert(eqAfter.size == 3)
    // sequence numbers preserved; dead keys gone: seq-2 file keeps only
    // keys 0..19 (20..40 superseded by seq 3), seq-3 keeps 20..49,
    // seq-4 keeps all 21 of its keys
    val bySeq = eqAfter.map(f => f.addedAt -> f.rowCount).toMap
    assert(bySeq == Map(2L -> 20L, 3L -> 30L, 4L -> 21L), s"got $bySeq")

    // scans bit-identical, point lookups still resolve the newest version
    assert(spark.table("lake.maint.rdf").orderBy("k").collect().sameElements(want))
    assert(spark.sql("SELECT v FROM lake.maint.rdf WHERE k = 30").collect()
      .head.getString(0) == "e2")
    // time travel to the pre-rewrite snapshot resolves the OLD delete files
    val preRewrite = spark.sql(
      "SELECT v FROM lake.maint.rdf VERSION AS OF 4 WHERE k = 55").collect()
    assert(preRewrite.head.getString(0) == "e3")

    // immediate re-run: pure no-op, no snapshot committed
    val snaps = LakeMaintenance.history(spark, "lake.maint.rdf").count()
    val res2 = spark.sql("CALL lake.system.rewrite_delete_files('maint.rdf')")
      .collect().head
    assert(res2.getInt(0) == 3 && res2.getInt(1) == 3)
    assert(LakeMaintenance.history(spark, "lake.maint.rdf").count() == snaps)

    // a fresh upsert after the rewrite still wins over merged entries, and
    // a second rewrite folds it in (4 task files + dead keys in seq 2/3)
    epoch("rdf_e4", 10, 31, "e4")
    assert(spark.sql("SELECT v FROM lake.maint.rdf WHERE k = 15").collect()
      .head.getString(0) == "e4")
    assert(spark.table("lake.maint.rdf").count() == 100)
    val res2b = spark.sql("CALL lake.system.rewrite_delete_files('maint.rdf')")
      .collect().head
    assert(res2b.getInt(0) == 7 && res2b.getInt(1) == 4, s"got $res2b")
    val bySeq2 = tableMeta("maint", "rdf").currentEqDeleteFiles
      .map(f => f.addedAt -> f.rowCount).toMap
    // e4 (keys 10..30) killed 10..19 from seq 2 and 20..30 from seq 3
    assert(bySeq2 == Map(2L -> 10L, 3L -> 19L, 4L -> 21L, 6L -> 21L), s"got $bySeq2")
    assert(spark.sql("SELECT v FROM lake.maint.rdf WHERE k = 15").collect()
      .head.getString(0) == "e4")
    assert(spark.sql("SELECT v FROM lake.maint.rdf WHERE k = 35").collect()
      .head.getString(0) == "e2")

    // full compaction folds everything; then there is nothing to rewrite
    LakeMaintenance.compact(spark, "lake.maint.rdf")
    assert(tableMeta("maint", "rdf").currentEqDeleteFiles.isEmpty)
    val res3 = spark.sql("CALL lake.system.rewrite_delete_files('maint.rdf')")
      .collect().head
    assert(res3.getInt(0) == 0 && res3.getInt(1) == 0)
    assert(spark.sql("SELECT v FROM lake.maint.rdf WHERE k = 15").collect()
      .head.getString(0) == "e4")
    spark.sql("DROP TABLE lake.maint.rdf")
  }

  test("rewrite_position_delete_files: bin-pack + dead-entry drop, scans identical") {
    import graft.catalog.DeleteFiles
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.rpd")
    spark.sql("""CREATE TABLE lake.maint.rpd (k BIGINT, v STRING)
                |TBLPROPERTIES ('write.delete.mode'='merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO lake.maint.rpd SELECT id, 'a' FROM range(0, 10)")
    spark.sql("INSERT INTO lake.maint.rpd SELECT id, 'b' FROM range(100, 110)")
    // three MoR deletes → several small tombstone files, 4 tombstone rows
    spark.sql("DELETE FROM lake.maint.rpd WHERE k = 5 OR k = 105")
    spark.sql("DELETE FROM lake.maint.rpd WHERE k = 6")
    spark.sql("DELETE FROM lake.maint.rpd WHERE k = 106")
    val want = spark.table("lake.maint.rpd").orderBy("k").collect()
    assert(want.length == 16)
    val before = tableMeta("maint", "rpd").currentDeleteFiles
    assert(before.size >= 2 && before.map(_.rowCount).sum == 4L,
      s"files=${before.size} rows=${before.map(_.rowCount).sum}")

    // scoped compact folds ONLY the k>=100 half: its data files rewrite,
    // tombstone entries aimed at them go DEAD (whole-file or in a shared
    // file — both shapes now exist only as garbage for the rewrite)
    spark.sql("CALL lake.system.compact('maint.rpd', where => 'k >= 100')")
    assert(spark.table("lake.maint.rpd").orderBy("k").collect().sameElements(want))
    val mid = tableMeta("maint", "rpd").currentDeleteFiles
    assert(mid.nonEmpty, "the k<100 tombstones must survive the scoped compact")

    val res = spark.sql("CALL lake.system.rewrite_position_delete_files('maint.rpd')")
      .collect().head
    assert(res.getInt(0) == mid.size && res.getInt(1) == 1, s"got $res from ${mid.size}")
    val after = tableMeta("maint", "rpd").currentDeleteFiles
    // one bin-packed file; only the 2 tombstones aimed at LIVE files remain
    assert(after.size == 1 && after.head.rowCount == 2L,
      s"files=${after.size} rows=${after.map(_.rowCount).sum}")
    // sorted output carries file-path bounds → coverage pruning stays tight
    assert(after.head.minValues.contains(DeleteFiles.FilePathCol) &&
      after.head.maxValues.contains(DeleteFiles.FilePathCol))
    assert(spark.table("lake.maint.rpd").orderBy("k").collect().sameElements(want))
    assert(spark.sql("SELECT count(*) FROM lake.maint.rpd WHERE k IN (5, 6, 105, 106)")
      .collect().head.getLong(0) == 0L)

    // immediate re-run: pure no-op, no snapshot committed
    val snaps = LakeMaintenance.history(spark, "lake.maint.rpd").count()
    val res2 = spark.sql("CALL lake.system.rewrite_position_delete_files('maint.rpd')")
      .collect().head
    assert(res2.getInt(0) == 1 && res2.getInt(1) == 1, s"got $res2")
    assert(LakeMaintenance.history(spark, "lake.maint.rpd").count() == snaps)

    // time travel to the pre-rewrite snapshot still resolves OLD tombstones
    val preId = tableMeta("maint", "rpd").snapshots
      .sortBy(_.snapshotId).takeRight(2).head.snapshotId
    assert(spark.sql(s"SELECT count(*) FROM lake.maint.rpd VERSION AS OF $preId")
      .collect().head.getLong(0) == 16L)

    // full compaction folds everything; nothing left to rewrite
    LakeMaintenance.compact(spark, "lake.maint.rpd")
    assert(tableMeta("maint", "rpd").currentDeleteFiles.isEmpty)
    val res3 = spark.sql("CALL lake.system.rewrite_position_delete_files('maint.rpd')")
      .collect().head
    assert(res3.getInt(0) == 0 && res3.getInt(1) == 0)
    assert(spark.table("lake.maint.rpd").orderBy("k").collect().sameElements(want))
    spark.sql("DROP TABLE lake.maint.rpd")
  }

  test("add_files races a concurrent INSERT: both append commits land exactly once") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.afr")
    val ext = java.nio.file.Files.createTempDirectory("graft_af_race").toString
    spark.sql("SELECT id AS k, 'ext' AS v FROM range(0, 100)").coalesce(1)
      .write.mode("overwrite").parquet(ext)
    spark.sql("CREATE TABLE lake.maint.afr (k BIGINT, v STRING)")
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val importer = Future {
      LakeMaintenance.addFiles(spark, "lake.maint.afr", ext)
    }
    val writer = Future {
      spark.sql("INSERT INTO lake.maint.afr SELECT id, 'ins' FROM range(1000, 1050)")
    }
    Await.result(Future.sequence(Seq(importer.map(_ => ()), writer.map(_ => ()))), 120.seconds)
    pool.shutdown()
    val keys = spark.table("lake.maint.afr").collect().map(_.getLong(0)).toSet
    assert(keys == ((0L until 100L) ++ (1000L until 1050L)).toSet,
      s"both racing appends must land exactly once (got ${keys.size} keys)")
    spark.sql("DROP TABLE lake.maint.afr")
  }

  test("rewrite_delete_files races a live upsert epoch: no lost update, no resurrection") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.rdfr")
    spark.sql("CREATE TABLE lake.maint.rdfr AS SELECT id AS k, 'base' AS v FROM range(0, 100)")
    spark.sql("SELECT id AS k, 'e1' AS v FROM range(0, 50)")
      .repartition(4).createOrReplaceTempView("rdfr_s1")
    spark.sql("CALL lake.system.upsert('maint.rdfr', 'rdfr_s1', 'k')")
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val rewriter = Future {
      // may rebase over the racing upsert's commit, or land first — either
      // way replaced-still-live is validated under CAS
      LakeMaintenance.rewriteDeleteFiles(spark, "lake.maint.rdfr")
    }
    val upserter = Future {
      val src = spark.sql("SELECT id AS k, 'e2' AS v FROM range(25, 75)").repartition(4)
      LakeMaintenance.upsert(spark, "lake.maint.rdfr", src, Seq("k"))
    }
    Await.result(Future.sequence(Seq(rewriter.map(_ => ()), upserter.map(_ => ()))), 120.seconds)
    pool.shutdown()
    // final state: e2 over 25..74 beats e1 over 0..49 beats base — exactly
    // once each, regardless of which commit won the race
    val rows = spark.table("lake.maint.rdfr").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 100)
    assert((0L until 25L).forall(rows(_) == "e1"))
    assert((25L until 75L).forall(rows(_) == "e2"))
    assert((75L until 100L).forall(rows(_) == "base"))
    // and a post-race rewrite still converges to one file per live seq
    spark.sql("CALL lake.system.rewrite_delete_files('maint.rdfr')")
    val rows2 = spark.table("lake.maint.rdfr").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows2 == rows)
    spark.sql("DROP TABLE lake.maint.rdfr")
  }

  test("rewrite_delete_files is transparent to changelog and incremental reads") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.rdt")
    spark.sql("CREATE TABLE lake.maint.rdt AS SELECT id AS k, 'base' AS v FROM range(0, 50)")
    spark.sql("SELECT id AS k, 'e1' AS v FROM range(0, 25)")
      .repartition(2).createOrReplaceTempView("rdt_s1")
    spark.sql("CALL lake.system.upsert('maint.rdt', 'rdt_s1', 'k')")   // snap 2
    spark.sql("CALL lake.system.rewrite_delete_files('maint.rdt')")    // snap 3
    spark.sql("INSERT INTO lake.maint.rdt SELECT id, 'app' FROM range(100, 110)") // snap 4

    // changelog across the rewrite: the rewrite contributes ZERO rows
    val log = LakeMaintenance.changelog(spark, "lake.maint.rdt", 0L, 4L)
    assert(log.where("_change_type = 'insert'").count() == 85) // 50 + 25 + 10
    assert(log.where("_change_type = 'delete'").count() == 25) // e1 over base
    assert(log.where("_commit_snapshot_id = 3").count() == 0)

    // incremental batch read crossing the rewrite sees only appended rows
    val inc = spark.read.option("start-snapshot-id", "2")
      .option("end-snapshot-id", "4").table("lake.maint.rdt")
    assert(inc.count() == 10)
    assert(inc.select("v").distinct().collect().map(_.getString(0)).toSeq == Seq("app"))
    spark.sql("DROP TABLE lake.maint.rdt")
  }

  test("snapshot clone at an older version reproduces the historical state, writable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.scv")
    spark.sql("DROP TABLE IF EXISTS lake.maint.scv2")
    spark.sql("CREATE TABLE lake.maint.scv AS SELECT id AS k FROM range(0, 10)") // snap 1
    spark.sql("INSERT INTO lake.maint.scv SELECT id FROM range(10, 30)")          // snap 2
    spark.sql("INSERT INTO lake.maint.scv SELECT id FROM range(30, 60)")          // snap 3
    spark.sql("CALL lake.system.snapshot('maint.scv', 'maint.scv2', 2)")
    assert(spark.table("lake.maint.scv2").count() == 30) // snap-2 state, not 60
    // the clone is a full writable table from that point
    spark.sql("INSERT INTO lake.maint.scv2 VALUES (1000)")
    assert(spark.table("lake.maint.scv2").count() == 31)
    assert(spark.table("lake.maint.scv").count() == 60)
    val e = intercept[Exception](
      spark.sql("CALL lake.system.snapshot('maint.scv', 'maint.scv3', 99)"))
    assert(e.getMessage.contains("no snapshot 99"), e.getMessage)
    spark.sql("DROP TABLE lake.maint.scv")
    spark.sql("DROP TABLE lake.maint.scv2")
  }

  test("add_files commits are append-family: changelog, incremental reads and MV refresh cross them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.afc")
    spark.sql("DROP TABLE IF EXISTS lake.maint.afc_mv")
    spark.sql("CREATE TABLE lake.maint.afc (k BIGINT, v STRING)")
    spark.sql("INSERT INTO lake.maint.afc SELECT id, 'a' FROM range(0, 10)")       // snap 1
    val ext = java.nio.file.Files.createTempDirectory("graft_afc").toString
    spark.sql("SELECT id AS k, 'x' AS v FROM range(100, 106)").coalesce(1)
      .write.mode("overwrite").parquet(ext)
    spark.sql(s"CALL lake.system.add_files('maint.afc', '$ext')")                  // snap 2
    spark.sql("INSERT INTO lake.maint.afc SELECT id, 'b' FROM range(200, 206)")    // snap 3

    // changelog treats the import as plain inserts
    val log = LakeMaintenance.changelog(spark, "lake.maint.afc", 0L, 3L)
    assert(log.where("_change_type = 'insert'").count() == 22)
    assert(log.where("_commit_snapshot_id = 2").count() == 6)
    assert(log.where("_change_type = 'delete'").count() == 0)

    // incremental batch read across the import
    val inc = spark.read.option("start-snapshot-id", "1")
      .option("end-snapshot-id", "3").table("lake.maint.afc")
    assert(inc.count() == 12)

    // MV refresh range containing the import keeps the append fast path
    graft.catalog.Materialized.createAggregate(spark, "lake.maint.afc_mv",
      "lake.maint.afc", Seq("v"), Nil)
    graft.catalog.Materialized.refresh(spark, "lake.maint.afc_mv")
    val mv = spark.table("lake.maint.afc_mv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mv == Map("a" -> 10L, "x" -> 6L, "b" -> 6L), s"got $mv")
    spark.sql("DROP TABLE lake.maint.afc_mv")
    spark.sql("DROP TABLE lake.maint.afc")
  }

  test("changelog over a clone: the snapshot commit introduces exactly the LIVE rows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.ccl")
    spark.sql("DROP TABLE IF EXISTS lake.maint.ccl2")
    spark.sql("DROP TABLE IF EXISTS lake.maint.ccl_mv")
    spark.sql("CREATE TABLE lake.maint.ccl AS SELECT id AS k, 'base' AS v FROM range(0, 40)")
    spark.sql("SELECT id AS k, 'e1' AS v FROM range(0, 20)").createOrReplaceTempView("ccl_s1")
    spark.sql("CALL lake.system.upsert('maint.ccl', 'ccl_s1', 'k')")
    spark.sql("CALL lake.system.snapshot('maint.ccl', 'maint.ccl2')")
    spark.sql("INSERT INTO lake.maint.ccl2 SELECT id, 'post' FROM range(100, 105)")

    val head = tableMeta("maint", "ccl2").currentSnapshotId
    val log = LakeMaintenance.changelog(spark, "lake.maint.ccl2", 0L, head)
    // clone commit = 40 LIVE rows (superseded base versions of keys 0..19
    // must NOT appear), then the post-clone append
    val bySnap = log.groupBy("_commit_snapshot_id", "_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val cloneSnap = tableMeta("maint", "ccl").currentSnapshotId // clone kept source's id
    assert(bySnap((cloneSnap, "insert")) == 40L, s"got $bySnap")
    assert(bySnap((head, "insert")) == 5L)
    assert(!bySnap.keys.exists(_._2 == "delete"))
    assert(log.where("v = 'base' AND k < 20").count() == 0,
      "superseded versions must not leak into the clone's changelog")
    // table_changes TVF composes over the clone too
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('lake.maint.ccl2', 0)").collect()
      .head.getLong(0) == 45L)

    // an MV whose source is a clone refreshes through the snapshot commit
    graft.catalog.Materialized.createAggregate(spark, "lake.maint.ccl_mv",
      "lake.maint.ccl2", Seq("v"), Nil)
    graft.catalog.Materialized.refresh(spark, "lake.maint.ccl_mv")
    val mv = spark.table("lake.maint.ccl_mv").where("cnt > 0").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mv == Map("base" -> 20L, "e1" -> 20L, "post" -> 5L), s"got $mv")
    spark.sql("DROP TABLE lake.maint.ccl_mv")
    spark.sql("DROP TABLE lake.maint.ccl2")
    spark.sql("DROP TABLE lake.maint.ccl")
  }

  test("tailing a clone: a stream started at the clone's snapshot follows post-clone appends only") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.stc")
    spark.sql("DROP TABLE IF EXISTS lake.maint.stc2")
    spark.sql("CREATE TABLE lake.maint.stc AS SELECT id AS k FROM range(0, 30)")
    spark.sql("SELECT id AS k FROM range(0, 10)").createOrReplaceTempView("stc_s1")
    // history the clone collapses (upsert ⇒ raw files ≠ live rows)
    spark.sql("CALL lake.system.upsert('maint.stc', 'stc_s1', 'k')")
    val cloneSnap = spark.sql("CALL lake.system.snapshot('maint.stc', 'maint.stc2')")
      .collect().head.getLong(1)
    // a from-scratch stream over the clone fails fast (collapsed history
    // is not file-expressible)...
    val ckptBad = java.nio.file.Files.createTempDirectory("graft-stc-bad").toString
    val bad = spark.readStream.table("lake.maint.stc2").writeStream
      .format("memory").queryName("stc_bad")
      .option("checkpointLocation", ckptBad).start()
    val e = intercept[Exception] { bad.processAllAvailable() }
    bad.stop()
    assert(e.getMessage.contains("snapshot") || e.getMessage.contains("append"),
      s"expected fail-fast, got: ${e.getMessage}")
    // ...the supported pattern: start AT the clone snapshot and tail
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stc").toString
    val q = spark.readStream
      .option("starting-snapshot-id", cloneSnap.toString)
      .table("lake.maint.stc2")
      .writeStream.format("memory").queryName("stc_tail")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("stc_tail").count() == 0) // nothing after the clone yet
      spark.sql("INSERT INTO lake.maint.stc2 SELECT id FROM range(100, 108)")
      q.processAllAvailable()
      val got = spark.table("stc_tail").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(100L until 108L), s"got ${got.toSeq}")
    } finally q.stop()
    spark.sql("DROP TABLE lake.maint.stc2")
    spark.sql("DROP TABLE lake.maint.stc")
  }

  test("SQL introspection: DESCRIBE, SHOW TBLPROPERTIES, SHOW CREATE TABLE on lake tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.maint")
    spark.sql("DROP TABLE IF EXISTS lake.maint.intro")
    spark.sql("CREATE TABLE lake.maint.intro (k BIGINT, v STRING) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.sort-order'='v')")
    val desc = spark.sql("DESCRIBE TABLE lake.maint.intro").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("k").contains("bigint") && desc.get("v").contains("string"), s"got $desc")
    val ext = spark.sql("DESCRIBE TABLE EXTENDED lake.maint.intro").collect()
      .map(_.getString(0))
    assert(ext.contains("# Partition Information"), s"got ${ext.toSeq}")
    val props = spark.sql("SHOW TBLPROPERTIES lake.maint.intro").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.sort-order").contains("v"), s"got $props")
    val create = spark.sql("SHOW CREATE TABLE lake.maint.intro").collect().head.getString(0)
    assert(create.contains("CREATE TABLE") && create.contains("PARTITIONED BY"), create)
    spark.sql("DROP TABLE lake.maint.intro")
  }
}
