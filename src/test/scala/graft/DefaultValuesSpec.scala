package graft

import org.scalatest.funsuite.AnyFunSuite

/** Column DEFAULT values — Iceberg v3's two-default model
  * ([[graft.catalog.ColumnDefaults]]): ADD COLUMN ... DEFAULT is a pure
  * metadata commit; rows in files written before the column existed read
  * the IMMUTABLE initial default (synthesized by the readers, zero
  * backfill), while the WRITE default fills INSERTs that omit the column
  * and can be changed/dropped later without touching old files' meaning.
  */
class DefaultValuesSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"
  private def tbl(p: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.dv2")
    s"lake.dv2.${uniq(p)}"
  }
  private def dataFiles(t: String): Set[String] = {
    val Array(c, ns, n) = t.split('.')
    spark.sql(s"SELECT path FROM $c.$ns.`$n$$files`").collect().map(_.getString(0)).toSet
  }

  test("ADD COLUMN DEFAULT: old files read the initial default with no rewrite") {
    val t = tbl("add")
    spark.sql(s"CREATE TABLE $t (k INT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    val filesBefore = dataFiles(t)

    spark.sql(s"ALTER TABLE $t ADD COLUMN src STRING DEFAULT 'web'")
    spark.sql(s"ALTER TABLE $t ADD COLUMN score DOUBLE DEFAULT 0.5")
    spark.sql(s"ALTER TABLE $t ADD COLUMN since DATE DEFAULT DATE'2020-01-06'")
    spark.sql(s"ALTER TABLE $t ADD COLUMN fee DECIMAL(10,2) DEFAULT 9.99")

    // metadata-only: the data files are untouched
    assert(dataFiles(t) == filesBefore, "ADD COLUMN DEFAULT must not rewrite data")

    spark.sql(s"INSERT INTO $t VALUES (3, 'c', 'api', 0.9, DATE'2024-05-01', 1.23)")
    val rows = spark.sql(
      s"SELECT k, src, score, CAST(since AS STRING) AS since, CAST(fee AS STRING) AS fee " +
        s"FROM $t ORDER BY k").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getString(3), r.getString(4))).toSeq ==
      Seq((1, "web", 0.5, "2020-01-06", "9.99"),
          (2, "web", 0.5, "2020-01-06", "9.99"),
          (3, "api", 0.9, "2024-05-01", "1.23")))

    // filters see the synthesized values on BOTH sides of the predicate
    assert(spark.sql(s"SELECT count(*) AS c FROM $t WHERE src = 'web'").head().getLong(0) == 2)
    assert(spark.sql(s"SELECT count(*) AS c FROM $t WHERE src <> 'web'").head().getLong(0) == 1)
    assert(spark.sql(s"SELECT count(*) AS c FROM $t WHERE src IS NULL").head().getLong(0) == 0)
    assert(spark.sql(s"SELECT min(score) AS m, max(score) AS x FROM $t").head().toSeq == Seq(0.5, 0.9))
    spark.sql(s"DROP TABLE $t")
  }

  test("INSERT fills the write default: omitted column lists and the DEFAULT keyword") {
    val t = tbl("ins")
    spark.sql(s"CREATE TABLE $t (k INT, v STRING DEFAULT 'missing', n INT DEFAULT 7)")
    spark.sql(s"INSERT INTO $t (k) VALUES (1)")
    spark.sql(s"INSERT INTO $t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql(s"INSERT INTO $t (k, v) VALUES (3, 'x')")
    val rows = spark.sql(s"SELECT k, v, n FROM $t ORDER BY k").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1, "missing", 7), (2, "missing", 7), (3, "x", 7)))
    spark.sql(s"DROP TABLE $t")
  }

  test("SET DEFAULT moves the write default only; the initial default is immutable") {
    val t = tbl("set")
    spark.sql(s"CREATE TABLE $t (k INT)")
    spark.sql(s"INSERT INTO $t VALUES (1)") // pre-add file: reads initial default forever
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING DEFAULT 'v1'")
    spark.sql(s"INSERT INTO $t (k) VALUES (2)") // materializes 'v1'
    spark.sql(s"ALTER TABLE $t ALTER COLUMN tag SET DEFAULT 'v2'")
    spark.sql(s"INSERT INTO $t (k) VALUES (3)") // materializes 'v2'
    // the pre-add file STILL reads 'v1' — SET DEFAULT must not reinterpret it
    val rows = spark.sql(s"SELECT k, tag FROM $t ORDER BY k").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "v1"), (2, "v1"), (3, "v2")))
    spark.sql(s"ALTER TABLE $t ALTER COLUMN tag DROP DEFAULT")
    spark.sql(s"INSERT INTO $t (k) VALUES (4)") // no write default left: NULL
    val r4 = spark.sql(s"SELECT tag FROM $t WHERE k = 4").head()
    assert(r4.isNullAt(0))
    // and row 1 STILL reads 'v1' (DROP DEFAULT touches writes, not history)
    assert(spark.sql(s"SELECT tag FROM $t WHERE k = 1").head().getString(0) == "v1")
    spark.sql(s"DROP TABLE $t")
  }

  test("ADD COLUMN NOT NULL requires a non-NULL default") {
    val t = tbl("nn")
    spark.sql(s"CREATE TABLE $t (k INT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    intercept[Exception] { spark.sql(s"ALTER TABLE $t ADD COLUMN m INT NOT NULL") }
    spark.sql(s"ALTER TABLE $t ADD COLUMN m INT NOT NULL DEFAULT 5")
    spark.sql(s"INSERT INTO $t VALUES (2, 6)")
    assert(spark.sql(s"SELECT sum(m) AS s FROM $t").head().getLong(0) == 11L)
    spark.sql(s"DROP TABLE $t")
  }

  test("merge-on-read: positional deletes and defaulted columns compose (row + columnar)") {
    val t = tbl("mor")
    spark.sql(s"CREATE TABLE $t (k INT, v DOUBLE) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, id * 1.0 FROM range(0, 100)")
    spark.sql(s"ALTER TABLE $t ADD COLUMN grp STRING DEFAULT 'legacy'")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, id * 1.0, 'fresh' FROM range(100, 200)")
    // positional tombstones on BOTH the pre-add and post-add files
    spark.sql(s"DELETE FROM $t WHERE k % 10 = 0")
    val rows = spark.sql(s"SELECT grp, count(*) AS c, sum(k) AS s FROM $t GROUP BY grp ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val legacy = (0 until 100).filter(_ % 10 != 0)
    val fresh = (100 until 200).filter(_ % 10 != 0)
    assert(rows == Seq(("fresh", fresh.size.toLong, fresh.sum.toLong),
      ("legacy", legacy.size.toLong, legacy.sum.toLong)))
    // row-mode positional path (metadata column request) sees defaults too
    val viaPos = spark.sql(s"SELECT count(*) AS c FROM $t WHERE grp = 'legacy' AND _pos >= 0")
      .head().getLong(0)
    assert(viaPos == legacy.size.toLong)
    spark.sql(s"DROP TABLE $t")
  }

  test("compaction materializes defaults; answers are identical before and after") {
    val t = tbl("compact")
    spark.sql(s"CREATE TABLE $t (k INT)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(0, 50)")
    spark.sql(s"ALTER TABLE $t ADD COLUMN w INT DEFAULT 3")
    spark.sql(s"INSERT INTO $t SELECT id, 4 FROM range(50, 80)")
    val before = spark.sql(s"SELECT sum(k * w) AS s, count(*) AS c FROM $t").head()
    graft.catalog.LakeMaintenance.compact(spark, t)
    val after = spark.sql(s"SELECT sum(k * w) AS s, count(*) AS c FROM $t").head()
    assert(before == after)
    assert(after.getLong(0) == (0 until 50).map(_ * 3).sum + (50 until 80).map(_ * 4).sum)
    // post-compaction files all CARRY the column: metadata agg pushdown
    // becomes provable again (stats exist for w in every live file)
    assert(spark.sql(s"SELECT min(w) AS m FROM $t").head().getInt(0) == 3)
    spark.sql(s"DROP TABLE $t")
  }

  test("stats pruning on a defaulted column: post-add files prune, pre-add files stay (conservative)") {
    val t = tbl("prune")
    val Array(_, ns, n) = t.split('.')
    spark.sql(s"CREATE TABLE $t (k INT)")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id FROM range(0, 100)") // pre-add: no stats for seg
    spark.sql(s"ALTER TABLE $t ADD COLUMN seg STRING DEFAULT 'none'")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, 'hot' FROM range(100, 200)")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, 'cold' FROM range(200, 300)")
    val plan = spark.sql(s"SELECT k, seg FROM $t WHERE seg = 'hot'")
      .queryExecution.executedPlan.toString
    val m = s"""LakeScan\\(lake\\.$ns\\.$n, (\\d+) files\\)""".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected a LakeScan leaf:\n$plan")
    // 3 files total; 'cold' prunes by min/max, the pre-add file has no
    // stats for seg (its rows read the default) and MUST be kept
    assert(m.get.group(1).toInt == 2, s"expected 2 of 3 files scanned:\n$plan")
    assert(spark.sql(s"SELECT count(*) AS c FROM $t WHERE seg = 'hot'").head().getLong(0) == 100)
    // correctness of the conservative keep: default-valued predicate hits
    // only the pre-add file's rows
    assert(spark.sql(s"SELECT count(*) AS c FROM $t WHERE seg = 'none'").head().getLong(0) == 100)
    spark.sql(s"DROP TABLE $t")
  }

  test("defaults survive the catalog round-trip and surface in DESCRIBE") {
    val t = tbl("desc")
    spark.sql(s"CREATE TABLE $t (k INT, v STRING DEFAULT 'fallback')")
    spark.sql(s"ALTER TABLE $t ADD COLUMN n INT DEFAULT 42")
    // a FRESH load (cache invalidated) must still know both defaults
    spark.sql(s"REFRESH TABLE $t")
    spark.sql(s"INSERT INTO $t (k) VALUES (1)")
    val r = spark.sql(s"SELECT v, n FROM $t").head()
    assert(r.getString(0) == "fallback" && r.getInt(1) == 42)
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
      .map(r0 => s"${r0.getString(0)}|${r0.getString(1)}|${r0.getString(2)}").mkString("\n")
    assert(desc.contains("fallback") && desc.contains("42"),
      s"DESCRIBE should surface the defaults:\n$desc")
    spark.sql(s"DROP TABLE $t")
  }

  test("time travel to a pre-add snapshot reads that era's schema (no defaulted column)") {
    val t = tbl("tt")
    spark.sql(s"CREATE TABLE $t (k INT)")
    spark.sql(s"INSERT INTO $t VALUES (1), (2)") // snapshot 1
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING DEFAULT 'x'")
    spark.sql(s"INSERT INTO $t VALUES (3, 'y')") // snapshot 2
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").schema.fieldNames.toSeq == Seq("k"),
      "the pre-add era has no defaulted column")
    val now = spark.sql(s"SELECT k, tag FROM $t ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(now == Seq((1, "x"), (2, "x"), (3, "y")))
    spark.sql(s"DROP TABLE $t")
  }

  test("copy-on-write DELETE on pre-add files preserves the initial default") {
    val t = tbl("cow")
    spark.sql(s"CREATE TABLE $t (k INT)") // copy-on-write is the default delete mode
    spark.sql(s"INSERT INTO $t SELECT id FROM range(0, 40)")
    spark.sql(s"ALTER TABLE $t ADD COLUMN flag BOOLEAN DEFAULT true")
    spark.sql(s"DELETE FROM $t WHERE k < 10") // rewrites the pre-add file
    val r = spark.sql(s"SELECT count(*) AS c FROM $t WHERE flag").head()
    assert(r.getLong(0) == 30L)
    spark.sql(s"DROP TABLE $t")
  }
}
