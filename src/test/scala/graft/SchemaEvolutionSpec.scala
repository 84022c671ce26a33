package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 schema evolution completions: lossless type widening,
  * nullability tightening proven from null-count stats, column comments and
  * reordering — all metadata-only commits (zero data files rewritten),
  * with the guards that keep bucket specs and upsert keys sound.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  test("ALTER COLUMN TYPE widens int->bigint / float->double / decimal precision, old files read back") {
    val t = s"lake.ev2.${uniq("wide")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev2")
    spark.sql(s"CREATE TABLE $t (k INT, f FLOAT, d DECIMAL(10,2))")
    spark.sql(s"INSERT INTO $t VALUES (1, CAST(1.5 AS FLOAT), CAST(12.34 AS DECIMAL(10,2))), " +
      "(2147483647, CAST(2.5 AS FLOAT), CAST(99999999.99 AS DECIMAL(10,2)))")

    spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE BIGINT")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN f TYPE DOUBLE")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN d TYPE DECIMAL(14,2)")

    // values beyond the old range land in the SAME column, old files promote
    spark.sql(s"INSERT INTO $t VALUES (9999999999, 3.5, CAST(999999999999.99 AS DECIMAL(14,2)))")
    val rows = spark.sql(s"SELECT k, f, d FROM $t ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2147483647L, 9999999999L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5, 3.5))
    assert(rows(2).getDecimal(2).toPlainString == "999999999999.99")
    // aggregates over promoted stats stay exact (metadata-only pushdown path)
    val agg = spark.sql(s"SELECT max(k) AS xk, min(f) AS mf FROM $t").collect()(0)
    assert(agg.getLong(0) == 9999999999L && agg.getDouble(1) == 1.5)
    spark.sql(s"DROP TABLE $t")
  }

  test("narrowing and lossy changes are refused") {
    val t = s"lake.ev2.${uniq("narrow")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev2")
    spark.sql(s"CREATE TABLE $t (k BIGINT, s STRING, d DECIMAL(10,2))")
    intercept[Exception] { spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE INT") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $t ALTER COLUMN s TYPE INT") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $t ALTER COLUMN d TYPE DECIMAL(12,4)") }
    spark.sql(s"DROP TABLE $t")
  }

  test("SET NOT NULL allowed only when null counts prove zero NULLs") {
    val t = s"lake.ev2.${uniq("nn")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev2")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k, " +
      "CASE WHEN id % 2 = 0 THEN NULL ELSE CAST(id AS STRING) END AS v FROM range(0, 100)")
    // Spark's SQL layer refuses nullable→non-nullable outright, so the
    // tightening direction goes through the TableCatalog API (the path
    // engines and connectors use)
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    val cat = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
    val Array(_, ns, name) = t.split('.')
    val ident = Identifier.of(Array(ns), name)
    // v has NULLs: tightening must fail; k has none: must succeed
    intercept[Exception] {
      cat.alterTable(ident, TableChange.updateColumnNullability(Array("v"), false))
    }
    cat.alterTable(ident, TableChange.updateColumnNullability(Array("k"), false))
    assert(!spark.table(t).schema("k").nullable)
    // and relaxing back is always fine (plain SQL supports this direction)
    spark.sql(s"ALTER TABLE $t ALTER COLUMN k DROP NOT NULL")
    assert(spark.table(t).schema("k").nullable)
    spark.sql(s"DROP TABLE $t")
  }

  test("COMMENT and FIRST/AFTER reorder are metadata-only and keep values bound") {
    val t = s"lake.ev2.${uniq("ord")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev2")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS a, concat('b', id) AS b, id * 2 AS c FROM range(0, 10)")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN b COMMENT 'label column'")
    assert(spark.table(t).schema("b").getComment().contains("label column"))

    spark.sql(s"ALTER TABLE $t ALTER COLUMN c FIRST")
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("c", "a", "b"))
    spark.sql(s"ALTER TABLE $t ALTER COLUMN c AFTER a")
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("a", "c", "b"))
    // data still reads by identity, old files unaffected
    val r = spark.sql(s"SELECT a, c, b FROM $t WHERE a = 3").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L && r.getString(2) == "b3")
    // SELECT * follows the new order
    assert(spark.sql(s"SELECT * FROM $t").schema.fieldNames.toSeq == Seq("a", "c", "b"))
    spark.sql(s"DROP TABLE $t")
  }

  test("time travel reads the snapshot's schema: drops resurrect, later adds don't appear") {
    val t = s"lake.ev2.${uniq("tts")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev2")
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k, concat('v', id) AS v FROM range(0, 10)") // snap 1
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (w STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('v', id), concat('w', id) FROM range(10, 15)") // snap 2
    spark.sql(s"ALTER TABLE $t DROP COLUMN v")

    // current shape: the drop is live
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("k", "w"))

    // snapshot 1: pre-ADD, pre-DROP — v resurrects WITH its data, no w
    val s1 = spark.sql(s"SELECT * FROM $t VERSION AS OF 1")
    assert(s1.schema.fieldNames.toSeq == Seq("k", "v"))
    val r1 = s1.orderBy("k").collect()
    assert(r1.length == 10 && r1(3).getString(1) == "v3")

    // snapshot 2: v still present, w present (null for the first files)
    val s2 = spark.sql(s"SELECT * FROM $t VERSION AS OF 2").orderBy("k").collect()
    assert(s2.length == 15)
    assert(s2(3).getString(1) == "v3" && s2(3).isNullAt(2))
    assert(s2(12).getString(1) == "v12" && s2(12).getString(2) == "w12")

    // a later RENAME doesn't rewrite history either
    spark.sql(s"ALTER TABLE $t RENAME COLUMN k TO id")
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").schema.fieldNames.head == "k")
    assert(spark.table(t).schema.fieldNames.head == "id")
    spark.sql(s"DROP TABLE $t")
  }

  test("guards: bucket source and upsert key columns refuse widening; key rename follows") {
    val t = s"lake.ev2.${uniq("guard")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev2")
    spark.sql(s"CREATE TABLE $t (k INT, v STRING) PARTITIONED BY (bucket(4, k))")
    intercept[Exception] { spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE BIGINT") }
    spark.sql(s"DROP TABLE $t")

    val u = s"lake.ev2.${uniq("ukey")}"
    spark.sql(s"CREATE TABLE $u AS SELECT CAST(id AS INT) AS k, CAST(id AS STRING) AS v FROM range(0, 50)")
    spark.sql(s"SELECT CAST(id AS INT) AS k, concat('u', id) AS v FROM range(40, 60)")
      .createOrReplaceTempView("ev2_ups_src")
    spark.sql(s"CALL lake.system.upsert('${u.stripPrefix("lake.")}', 'ev2_ups_src', 'k')")
    // the key column: no widening, no drop — but rename follows the key list
    intercept[Exception] { spark.sql(s"ALTER TABLE $u ALTER COLUMN k TYPE BIGINT") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $u DROP COLUMN k") }
    spark.sql(s"ALTER TABLE $u RENAME COLUMN k TO pk")
    assert(spark.table(u).schema.fieldNames.contains("pk"))
    // upsert under the NEW key name still works against OLD eq-delete files
    spark.sql(s"SELECT CAST(id AS INT) AS pk, concat('w', id) AS v FROM range(55, 70)")
      .createOrReplaceTempView("ev2_ups_src2")
    spark.sql(s"CALL lake.system.upsert('${u.stripPrefix("lake.")}', 'ev2_ups_src2', 'pk')")
    val rows = spark.sql(s"SELECT pk, v FROM $u").collect()
    assert(rows.length == 70)
    assert(rows.count(_.getString(1).startsWith("w")) == 15)
    assert(rows.count(_.getString(1).startsWith("u")) == 15) // 40..54 keep epoch-1
    spark.sql(s"DROP TABLE $u")
  }

  test("RENAME COLUMN follows write.sort-order; writes keep ordering provenance") {
    val t = s"lake.ev2.${uniq("sortren")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev2")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) TBLPROPERTIES ('write.sort-order'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, id * 2 FROM range(100)")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN k TO key")
    // the property followed the rename (no stale name poisoning resolution)
    val so = spark.sql(s"SHOW TBLPROPERTIES $t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(so.get("write.sort-order").contains("key"), s"got $so")
    // writes under the NEW name still resolve the sort order and succeed
    spark.sql(s"INSERT INTO $t SELECT id + 100, id FROM range(50)")
    assert(spark.table(t).count() == 150L)
    spark.sql(s"DROP TABLE $t")
  }
}
