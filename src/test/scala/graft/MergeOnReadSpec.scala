package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Merge-on-read positional deletes (SupportsDelta) + `_file`/`_pos`
  * metadata columns. The reference's pointer-swap protocol commits ANY
  * metadata shape atomically (src/catalog/mod.rs:296-347); these tests
  * cover the delta shape: tombstone files that subtract rows at scan time
  * instead of rewriting data files at commit time.
  */
class MergeOnReadSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  test("_file/_pos metadata columns: queryable, unique per row, stable across files") {
    val t = s"lake.mor.${uniq("meta")}"
    spark.sql(s"CREATE TABLE $t (id INT, v STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('v', id) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('v', id) FROM range(100, 150)")

    val rows = spark.sql(s"SELECT id, _file, _pos FROM $t").collect()
    assert(rows.length == 150)
    // (file, pos) is a unique row id
    assert(rows.map(r => (r.getString(1), r.getLong(2))).distinct.length == 150)
    // at least two files (two commits), every _pos starts at 0 within its file
    val byFile = rows.groupBy(_.getString(1))
    assert(byFile.size >= 2)
    byFile.values.foreach { rs =>
      val ps = rs.map(_.getLong(2)).sorted
      assert(ps.head == 0L && ps.last == ps.length - 1, "positions are dense per file")
    }
    // data values still correct through the positional reader
    assert(rows.map(_.getInt(0)).sorted.sameElements(0 until 150))
    spark.sql(s"DROP TABLE $t")
  }

  test("metadata columns survive filters and projections") {
    val t = s"lake.mor.${uniq("metaf")}"
    spark.sql(s"CREATE TABLE $t (id INT, v STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('v', id) FROM range(0, 50)")
    val rows = spark.sql(s"SELECT _pos, v FROM $t WHERE id >= 40").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getString(1)).toSet == (40 until 50).map(i => s"v$i").toSet)
    spark.sql(s"DROP TABLE $t")
  }
}
