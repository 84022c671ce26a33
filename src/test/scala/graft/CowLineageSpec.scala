package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Lineage-preserving copy-on-write (`write.cow.preserve-lineage=true`):
  * UPDATE/MERGE/DELETE keep true CoW table shape — touched files rewritten,
  * ZERO delete files post-commit — while updated and surviving rows keep
  * their `_row_id` (Iceberg v3's update contract), which the default
  * ReplaceData plan structurally cannot do (Spark strips metadata
  * attributes before the group-based write). The route is the delta
  * operation's fold-on-commit path ([[graft.catalog.LakeDeltaOperation]]).
  */
class CowLineageSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"
  private def tbl(p: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.cowl")
    s"lake.cowl.${uniq(p)}"
  }
  private def meta(t: String, kind: String) = {
    val Array(c, ns, n) = t.split('.')
    spark.sql(s"SELECT * FROM $c.$ns.`$n$$$kind`")
  }
  private def lineageOf(t: String): Map[Long, (Long, Long)] =
    spark.sql(s"SELECT k, _row_id, _last_updated_seq FROM $t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("UPDATE preserves updated AND surviving row ids; zero delete files; untouched files stay") {
    val t = tbl("upd")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.cow.preserve-lineage'='true')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, concat('a', id) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, concat('b', id) FROM range(100, 200)")
    val filesBefore = meta(t, "files").select("path").collect().map(_.getString(0)).toSet
    assert(filesBefore.size == 2)
    val before = lineageOf(t)
    spark.sql(s"UPDATE $t SET v = concat(v, '!') WHERE k < 20")
    val after = lineageOf(t)
    // every row keeps its id; only the 20 updated rows take a new sequence
    assert(after.keySet == before.keySet)
    assert(after.forall { case (k, (rid, _)) => before(k)._1 == rid },
      "updated and surviving rows must keep their _row_id")
    val bumped = after.filter { case (k, (_, seq)) => seq != before(k)._2 }.keys.toSet
    assert(bumped == (0L until 20L).toSet, s"only updated rows re-sequence, got $bumped")
    // true copy-on-write shape: no delete files, touched file replaced,
    // untouched file untouched
    assert(meta(t, "deletes").count() == 0, "fold must leave zero delete files")
    val filesAfter = meta(t, "files").select("path").collect().map(_.getString(0)).toSet
    assert(filesAfter.intersect(filesBefore).size == 1,
      s"exactly the untouched file survives: before=$filesBefore after=$filesAfter")
    // values correct
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v LIKE '%!'").head().getLong(0) == 20)
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 200)
    spark.sql(s"DROP TABLE $t")
  }

  test("MERGE: updates keep ids, inserts mint fresh unique ids, deletes drop; zero delete files") {
    val t = tbl("mrg")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.cow.preserve-lineage'='true')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, concat('a', id) FROM range(0, 100)")
    val before = lineageOf(t)
    spark.sql(
      s"""MERGE INTO $t g USING (
         |  SELECT id AS k, concat('n', id) AS v FROM range(90, 120)) s
         |ON g.k = s.k
         |WHEN MATCHED AND g.k < 95 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val after = lineageOf(t)
    assert(after.keySet == ((0L until 90L) ++ (95L until 120L)).toSet)
    // survivors + updated rows keep their ids
    assert((0L until 90L).forall(k => after(k)._1 == before(k)._1))
    assert((95L until 100L).forall(k => after(k)._1 == before(k)._1),
      "MATCHED UPDATE must preserve _row_id through the fold")
    // inserted rows mint fresh ids, unique table-wide
    val ids = after.values.map(_._1).toSeq
    assert(ids.distinct.length == ids.length, "row ids stay unique")
    assert((100L until 120L).forall(k => !before.values.exists(_._1 == after(k)._1)))
    assert(meta(t, "deletes").count() == 0)
    spark.sql(s"DROP TABLE $t")
  }

  test("non-translatable DELETE folds: survivors keep ids, zero delete files") {
    val t = tbl("del")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.cow.preserve-lineage'='true')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, concat('a', id) FROM range(0, 100)")
    val before = lineageOf(t)
    // k % 7 = 0 doesn't translate to a file-aligned deleteWhere predicate
    spark.sql(s"DELETE FROM $t WHERE k % 7 = 0")
    val after = lineageOf(t)
    assert(after.keySet == (0L until 100L).filter(_ % 7 != 0).toSet)
    assert(after.forall { case (k, (rid, seq)) => before(k) == (rid, seq) },
      "survivors keep id AND sequence — a fold-DELETE never touched them")
    assert(meta(t, "deletes").count() == 0)
    spark.sql(s"DROP TABLE $t")
  }

  test("pending MoR tombstones on a touched file fold in with the CoW commit") {
    val t = tbl("mix")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, concat('a', id) FROM range(0, 100)")
    spark.sql(s"DELETE FROM $t WHERE k >= 90") // pending positional tombstones
    assert(meta(t, "deletes").count() == 1)
    val before = lineageOf(t)
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES (" +
      "'write.delete.mode'='copy-on-write', 'write.cow.preserve-lineage'='true')")
    spark.sql(s"UPDATE $t SET v = 'u' WHERE k < 10")
    val after = lineageOf(t)
    assert(after.keySet == (0L until 90L).toSet, "tombstoned rows stay dead")
    assert(after.forall { case (k, (rid, _)) => before(k)._1 == rid })
    // the fold consumed the pre-existing tombstone file too
    assert(meta(t, "deletes").count() == 0,
      "pending tombstones whose last target was rewritten must fold away")
    spark.sql(s"DROP TABLE $t")
  }

  test("UPDATE that moves rows across partitions: ids ride along, files stay single-valued") {
    val t = tbl("move")
    spark.sql(s"CREATE TABLE $t (k BIGINT, p BIGINT) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('write.cow.preserve-lineage'='true')")
    spark.sql(s"INSERT INTO $t SELECT id, id % 4 FROM range(0, 400)")
    val before = spark.sql(s"SELECT k, _row_id FROM $t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // rows leave partition 1 for partition 7 — tombstoned there, re-inserted
    // here, identity preserved through update()
    spark.sql(s"UPDATE $t SET p = 7 WHERE p = 1 AND k < 40")
    val after = spark.sql(s"SELECT k, _row_id FROM $t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after == before, "a partition-moving update must not change any _row_id")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 7").head().getLong(0) ==
      (0L until 40L).count(_ % 4 == 1))
    assert(meta(t, "deletes").count() == 0)
    val parts = meta(t, "files").select("min_values", "max_values").collect()
      .map(r => (r.getMap[String, String](0).get("p"), r.getMap[String, String](1).get("p")))
    assert(parts.forall { case (lo, hi) => lo == hi },
      s"moved rows must land in single-valued partition files: ${parts.toSeq}")
    spark.sql(s"DROP TABLE $t")
  }

  test("fold works under write.delete.format=dv (temp deletion vectors, same CoW shape)") {
    val t = tbl("dv")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) TBLPROPERTIES (" +
      "'write.cow.preserve-lineage'='true', 'write.delete.format'='dv')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, concat('a', id) FROM range(0, 100)")
    val before = lineageOf(t)
    spark.sql(s"UPDATE $t SET v = 'u' WHERE k % 4 = 0")
    val after = lineageOf(t)
    assert(after.keySet == before.keySet)
    assert(after.forall { case (k, (rid, _)) => before(k)._1 == rid })
    assert(meta(t, "deletes").count() == 0, "DV-mode fold must leave zero delete files")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v = 'u'").head().getLong(0) == 25)
    spark.sql(s"DROP TABLE $t")
  }

  test("fold commit fails loudly if its target was concurrently rewritten; temp tombstones are reclaimed") {
    val t = tbl("race")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.cow.preserve-lineage'='true')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, concat('a', id) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, concat('b', id) FROM range(100, 5000)")
    val Array(cat, ns, name) = t.split('.')
    val c = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val table = c.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name))
      .asInstanceOf[LakeTable]
    val store = c.asInstanceOf[LakeCatalog].pointerStore
    val target = table.meta.currentFiles.head.path
    // a concurrent compaction rewrites the target between scan and commit
    LakeMaintenance.compact(spark, t, smallFileBytes = Long.MaxValue)
    val conf = new org.apache.hadoop.conf.Configuration()
    // a real on-disk temp tombstone (valid parquet — the stale-handle fold
    // reads it during the rewrite): the failed fold must reclaim it
    val tomb = new org.apache.hadoop.fs.Path(s"${table.meta.location}/deletes/race-tomb.parquet")
    val fs = tomb.getFileSystem(conf)
    val tmpDir = s"${table.meta.location}/deletes/race-tomb-src"
    spark.createDataFrame(Seq((target, 0L))).toDF("file_path", "pos")
      .repartition(1).write.parquet(tmpDir)
    val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmpDir/part-*.parquet"))(0).getPath
    fs.rename(part, tomb)
    val batchWrite = new LakeDeltaBatchWrite(table,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE,
      table.meta.schema, store, conf, foldOnCommit = true)
    val snapsBefore = lakeSnapshotCount(t)
    intercept[CommitConflictException] {
      batchWrite.commit(Array(LakeDeltaCommitMessage(Nil,
        Seq(DataFileMeta(tomb.toString, 1, 10,
          Map("file_path" -> target), Map("file_path" -> target))),
        Seq(target))))
    }
    assert(!fs.exists(tomb), "failed fold must delete its temp tombstone files")
    assert(lakeSnapshotCount(t) == snapsBefore, "failed fold must not commit")
    spark.sql(s"DROP TABLE $t")
  }

  private def lakeSnapshotCount(t: String): Long = meta(t, "snapshots").count()

  test("partitioned fold keeps partition clustering and prunes like any write") {
    val t = tbl("part")
    spark.sql(s"CREATE TABLE $t (k BIGINT, p BIGINT) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('write.cow.preserve-lineage'='true')")
    spark.sql(s"INSERT INTO $t SELECT id, id % 4 FROM range(0, 400)")
    spark.sql(s"UPDATE $t SET k = k + 1000 WHERE p = 2 AND k < 100")
    // rewritten files are still single-valued on the partition column
    // (per-file min == max on p — what partition pruning relies on)
    val parts = meta(t, "files").select("min_values", "max_values").collect()
      .map(r => (r.getMap[String, String](0).get("p"), r.getMap[String, String](1).get("p")))
    assert(parts.nonEmpty && parts.forall { case (lo, hi) => lo == hi },
      s"every file single-valued on p: ${parts.toSeq}")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = 2 AND k >= 1000").head().getLong(0) ==
      (0L until 100L).count(_ % 4 == 2))
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 400)
    assert(meta(t, "deletes").count() == 0)
    spark.sql(s"DROP TABLE $t")
  }
}
