package graft

import org.scalatest.funsuite.AnyFunSuite

/** VARIANT columns (Spark 4.1 / Iceberg v3 semi-structured type) in lake
  * tables: JSON parses once at write into variant's binary encoding,
  * reads shred typed paths with `variant_get`. The writer skips min/max
  * stats for variant (conservative: no pruning on the column), dirty
  * files read through the positional ROW readers (variant is not a flat
  * columnar type), and compaction carries variant values and row lineage
  * together.
  */
class VariantSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"
  private def tbl(p: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.vr")
    s"lake.vr.${uniq(p)}"
  }

  test("variant round-trip: nested objects, arrays, mixed types, null") {
    val t = tbl("rt")
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload VARIANT)")
    spark.sql(
      s"""INSERT INTO $t VALUES
         |  (1, parse_json('{"a": 1, "b": {"c": [1, 2, 3]}, "s": "x"}')),
         |  (2, parse_json('{"a": 2.5, "b": {"c": []}, "extra": true}')),
         |  (3, parse_json('[10, {"deep": "v"}]')),
         |  (4, NULL)""".stripMargin)
    val rows = spark.sql(
      s"""SELECT id,
         |  variant_get(payload, '$$.a', 'double') AS a,
         |  variant_get(payload, '$$.b.c[1]', 'long') AS c1,
         |  variant_get(payload, '$$[1].deep', 'string') AS deep,
         |  to_json(payload) AS js
         |FROM $t ORDER BY id""".stripMargin).collect()
    assert(rows(0).getDouble(1) == 1.0 && rows(0).getLong(2) == 2L)
    assert(rows(1).getDouble(1) == 2.5 && rows(1).isNullAt(2))
    assert(rows(2).getString(3) == "v")
    assert(rows(3).isNullAt(4), "NULL variant stays NULL")
    assert(rows(0).getString(4).contains("\"c\":[1,2,3]"))
    spark.sql(s"DROP TABLE $t")
  }

  test("MoR deletes + compaction on a variant table: values and lineage survive") {
    val t = tbl("mor")
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload VARIANT) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      "parse_json(concat('{\"n\":', id, '}')) FROM range(0, 200)")
    spark.sql(s"DELETE FROM $t WHERE id % 5 = 0")
    def state() = spark.sql(
      s"SELECT id, variant_get(payload, '$$.n', 'long') AS n, _row_id FROM $t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = state()
    assert(before.size == 160 && before.forall(r => r._1 == r._2))
    graft.catalog.LakeMaintenance.compact(spark, t)
    assert(state() == before, "compaction must carry variant values AND row ids")
    spark.sql(s"DROP TABLE $t")
  }

  test("write.variant.shred-paths: variant_get predicates FILE-prune on shredded stats") {
    val t = tbl("shred")
    val Array(_, ns, n) = t.split('.')
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload VARIANT) TBLPROPERTIES (" +
      "'write.variant.shred-paths' = 'payload:$.k:bigint')")
    // three files with disjoint $.k ranges
    for (lo <- Seq(0, 100, 200))
      spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
        s"parse_json(concat('{\"k\":', id + $lo, ',\"s\":\"x', id, '\"}')) FROM range(0, 100)")
    // stats recorded under the synthetic key
    val stats = spark.sql(s"SELECT min_values FROM lake.$ns.`$n$$files`").collect()
      .map(_.getMap[String, String](0))
    assert(stats.length == 3 && stats.forall(_.contains("payload#$.k#long")),
      s"expected typed shredded stats: ${stats.toSeq}")
    def scanned(sql: String): (Int, Long) = {
      val df = spark.sql(sql)
      val m = s"""LakeScan\\(lake\\.$ns\\.$n, (\\d+) files\\)""".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      (m.map(_.group(1).toInt).getOrElse(-1), df.head().getLong(0))
    }
    // point and range predicates on the shredded path each read ONE file
    val (f1, c1) = scanned(s"SELECT count(*) AS c FROM $t " +
      "WHERE variant_get(payload, '$.k', 'bigint') = 150")
    assert(f1 == 1 && c1 == 1, s"point lookup: $f1 files, $c1 rows")
    val (f2, c2) = scanned(s"SELECT count(*) AS c FROM $t " +
      "WHERE variant_get(payload, '$.k', 'bigint') < 100")
    assert(f2 == 1 && c2 == 100, s"range scan: $f2 files, $c2 rows")
    // an UNSHREDDED path has no stats: conservative full scan, right answer
    val (f3, c3) = scanned(s"SELECT count(*) AS c FROM $t " +
      "WHERE variant_get(payload, '$.s', 'string') = 'x5'")
    assert(f3 == 3 && c3 == 3, s"unshredded path: $f3 files, $c3 rows")
    // extracting the SAME path as a DIFFERENT type must not consult
    // stats ordered by the shredded type: conservative full scan
    val (f5, c5) = scanned(s"SELECT count(*) AS c FROM $t " +
      "WHERE variant_get(payload, '$.k', 'string') = '150'")
    assert(f5 == 3 && c5 == 1, s"cross-type extraction: $f5 files, $c5 rows")
    // stat keys follow a column RENAME (logical re-keying), and the
    // property itself follows so FUTURE writes keep shredding
    spark.sql(s"ALTER TABLE $t RENAME COLUMN payload TO doc")
    assert(spark.sql(s"SHOW TBLPROPERTIES $t ('write.variant.shred-paths')")
      .head().getString(1).startsWith("doc:"),
      "shred-paths property must follow the rename")
    val (f4, c4) = scanned(s"SELECT count(*) AS c FROM $t " +
      "WHERE variant_get(doc, '$.k', 'bigint') = 250")
    assert(f4 == 1 && c4 == 1, s"after rename: $f4 files, $c4 rows")
    spark.sql(s"DROP TABLE $t")
  }

  test("a failed strict cast poisons the file's shred stats: errors are never pruned away") {
    val t = tbl("poison")
    val Array(_, ns, n) = t.split('.')
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload VARIANT) TBLPROPERTIES (" +
      "'write.variant.shred-paths' = 'payload:$.k:bigint')")
    // file 1: clean longs; file 2: one row whose $.k exists but can't cast
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      "parse_json(concat('{\"k\":', id, '}')) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, parse_json(p) " +
      "FROM VALUES (100L, '{\"k\": 100}'), (101L, '{\"k\": \"abc\"}') AS v(id, p)")
    val stats = spark.sql(s"SELECT min_values FROM lake.$ns.`$n$$files`").collect()
      .map(_.getMap[String, String](0))
    assert(stats.count(_.contains("payload#$.k#long")) == 1,
      s"the poisoned file must carry NO shred stats: ${stats.toSeq}")
    // strict variant_get must reach the bad row and throw — even though
    // [100,100]-style stats would have pruned the file for k=999
    val e = intercept[Exception] {
      spark.sql(s"SELECT count(*) AS c FROM $t " +
        "WHERE variant_get(payload, '$.k', 'bigint') = 999").head()
    }
    assert(e.getMessage.toLowerCase.contains("variant") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("variant")),
      s"expected the strict-cast error to surface: ${e.getMessage}")
    spark.sql(s"DROP TABLE $t")
  }

  test("writer skips stats for variant; scans and metadata tables stay healthy") {
    val t = tbl("st")
    val Array(_, ns, n) = t.split('.')
    spark.sql(s"CREATE TABLE $t (id BIGINT, payload VARIANT)")
    spark.sql(s"INSERT INTO $t SELECT id, parse_json(concat('{\"x\":', id, '}')) FROM range(0, 50)")
    val f = spark.sql(s"SELECT min_values, max_values FROM lake.$ns.`$n$$files`").head()
    val mins = f.getMap[String, String](0)
    assert(mins.contains("id") && !mins.keys.exists(_.contains("payload")),
      s"variant must carry no min/max stats: $mins")
    // id stats still prune; the variant column rides along untouched
    assert(spark.sql(s"SELECT count(*) AS c FROM $t WHERE id < 10").head().getLong(0) == 10)
    spark.sql(s"DROP TABLE $t")
  }

  test("shred-spec parsing: one malformed legacy entry never disables the valid ones") {
    import graft.catalog.VariantShred.parse
    // `;` authoritative, commas inside types survive
    assert(parse("a:$.x:int;b:$.y:decimal(10,2)") ==
      Seq(("a", "$.x", "int"), ("b", "$.y", "decimal(10,2)")))
    // single parameterized entry with NO `;`: the comma belongs to the type
    assert(parse("c:$.p:decimal(10,2)") == Seq(("c", "$.p", "decimal(10,2)")))
    // clean legacy comma list
    assert(parse("a:$.x:int,b:$.y:bigint") ==
      Seq(("a", "$.x", "int"), ("b", "$.y", "bigint")))
    // degraded legacy: the bad piece is skipped LOUDLY, the good one kept —
    // it must not poison the whole spec into a silent no-op
    assert(parse("a:$.x:int,oops") == Seq(("a", "$.x", "int")))
    assert(parse("garbage") == Nil)
    // comma list where one type ITSELF contains a comma: the top-level
    // split never cuts inside parentheses, so both entries survive
    assert(parse("a:$.x:int,b:$.y:decimal(10,2)") ==
      Seq(("a", "$.x", "int"), ("b", "$.y", "decimal(10,2)")))
    assert(parse("b:$.y:decimal(10,2),a:$.x:int") ==
      Seq(("b", "$.y", "decimal(10,2)"), ("a", "$.x", "int")))
  }
}
