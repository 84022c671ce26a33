package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.StatBounds

/** Manifest string-bound truncation ([[graft.catalog.StatBounds]]): long
  * text columns must not embed whole documents in per-file min/max — bounds
  * widen to a 64-code-point prefix (lower = prefix, upper = prefix with
  * last code point incremented), keeping every pruning decision sound
  * while metadata stays O(files), not O(files × document length).
  */
class StatsTruncationSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"
  private def tbl(p: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.trunc")
    s"lake.trunc.${uniq(p)}"
  }
  private def bounds(t: String, c: String): Seq[(Option[String], Option[String])] = {
    val Array(cat, ns, n) = t.split('.')
    spark.sql(s"SELECT min_values, max_values FROM $cat.$ns.`$n$$files`")
      .collect().map(r => (r.getMap[String, String](0).get(c), r.getMap[String, String](1).get(c))).toSeq
  }

  test("StatBounds: prefix lower bound, incremented upper bound, unicode edges") {
    val s = "ab" * 100
    assert(StatBounds.truncateMin(s, 8) == "abababab")
    assert(StatBounds.truncateMax(s, 8).contains("abababac"))
    // short strings pass through untouched
    assert(StatBounds.truncateMin("xy", 8) == "xy")
    assert(StatBounds.truncateMax("xy", 8).contains("xy"))
    // surrogate gap: U+D7FF increments to U+E000, never into D800..DFFF
    val d7ff = "aa" + "퟿" + "z" * 100
    assert(StatBounds.truncateMax(d7ff, 3).contains("aa"))
    // max code point carries: the U+10FFFF tail drops, previous increments
    val sup = new StringBuilder("b")
    (1 to 3).foreach(_ => sup.appendAll(Character.toChars(0x10FFFF)))
    val out = StatBounds.truncateMax(sup.toString + "qqqq", 4).get
    assert(out == "c", s"carry must drop the U+10FFFF tail and bump 'b': ${out.toList}")
    // every prefix code point at the max -> no finite upper bound
    val allMax = new StringBuilder
    (1 to 4).foreach(_ => allMax.appendAll(Character.toChars(0x10FFFF)))
    assert(StatBounds.truncateMax(allMax.toString + "tail", 4).isEmpty)
    // the widened bounds really bound: UTF8String byte order
    import org.apache.spark.unsafe.types.UTF8String
    def u(x: String) = UTF8String.fromString(x)
    assert(u(StatBounds.truncateMin(s, 8)).compareTo(u(s)) <= 0)
    assert(u(StatBounds.truncateMax(s, 8).get).compareTo(u(s)) >= 0)
    assert(u(StatBounds.truncateMax(d7ff, 3).get).compareTo(u(d7ff)) >= 0)
  }

  test("long text bounds truncate in manifests; equality probes stay correct") {
    val t = tbl("txt")
    spark.sql(s"CREATE TABLE $t (k BIGINT, txt STRING)")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      s"concat('doc-', lpad(CAST(id AS STRING), 5, '0'), repeat('x', 500)) FROM range(0, 100)")
    val Seq((lo, hi)) = bounds(t, "txt")
    assert(lo.get.codePointCount(0, lo.get.length) <= 64, s"min not truncated: ${lo.get.length} chars")
    assert(hi.get.codePointCount(0, hi.get.length) <= 64, s"max not truncated: ${hi.get.length} chars")
    assert(lo.get == "doc-00000" + "x" * 55, "lower bound is the 64-cp prefix")
    // upper bound exceeds every stored value (prefix + incremented last cp)
    assert(hi.get > "doc-00099", s"upper bound must clear the true max: ${hi.get}")
    // correctness: an exact-match probe on a full-length value still finds it
    val needle = "doc-00042" + "x" * 500
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE txt = '$needle'").head().getLong(0) == 1)
    // soundness the other way: values below the prefix range prune away,
    // values inside the widened range scan (never wrongly skipped)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE txt = 'aaa'").head().getLong(0) == 0)
    spark.sql(s"DROP TABLE $t")
  }

  test("identity partition values stay exact (attribution needs min == max)") {
    val long1 = "domain-" + "a" * 100
    val long2 = "domain-" + "b" * 100
    val t = tbl("part")
    spark.sql(s"CREATE TABLE $t (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t SELECT id, IF(id % 2 = 0, '$long1', '$long2') FROM range(0, 100)")
    val bs = bounds(t, "p")
    assert(bs.nonEmpty && bs.forall { case (lo, hi) => lo == hi && lo.get.length > 64 },
      s"identity partition bounds must stay exact and single-valued: $bs")
    // dynamic overwrite still attributes the touched partition exactly
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(s"INSERT OVERWRITE $t SELECT id + 1000, '$long1' FROM range(0, 10)")
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = '$long1'").head().getLong(0) == 10)
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE p = '$long2'").head().getLong(0) == 50)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    spark.sql(s"DROP TABLE $t")
  }

  test("write.metadata.truncate-length: 0 disables, custom length honored") {
    val t = tbl("prop")
    spark.sql(s"CREATE TABLE $t (k BIGINT, txt STRING) " +
      "TBLPROPERTIES ('write.metadata.truncate-length'='0')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, repeat('y', 200) FROM range(0, 5)")
    assert(bounds(t, "txt").head._1.get.length == 200, "0 must disable truncation")
    spark.sql(s"DROP TABLE $t")
    val t2 = tbl("prop8")
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, txt STRING) " +
      "TBLPROPERTIES ('write.metadata.truncate-length'='8')")
    spark.sql(s"INSERT INTO $t2 SELECT /*+ REPARTITION(1) */ id, repeat('y', 200) FROM range(0, 5)")
    val (lo2, hi2) = bounds(t2, "txt").head
    assert(lo2.get == "y" * 8 && hi2.get == "y" * 7 + "z")
    spark.sql(s"DROP TABLE $t2")
  }

  test("LIKE 'prefix%' pruning stays sound when the probe prefix outruns truncated bounds") {
    val t = tbl("like")
    spark.sql(s"CREATE TABLE $t (k BIGINT, txt STRING)")
    // two files with distinct 64+-char value families
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      s"concat('alpha-', repeat('a', 100), CAST(id AS STRING)) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      s"concat('omega-', repeat('z', 100), CAST(id AS STRING)) FROM range(50, 100)")
    // probe prefix LONGER than the 64-cp bound: rows must still be found
    val p = "alpha-" + "a" * 100
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE txt LIKE '$p%'").head().getLong(0) == 50)
    // and a short prefix that rules out a family still prunes correctly
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE txt LIKE 'beta%'").head().getLong(0) == 0)
    spark.sql(s"DROP TABLE $t")
  }

  test("tombstone file_path ranges keep full precision (covering stays tight)") {
    val t = tbl("mor")
    spark.sql(s"CREATE TABLE $t (k BIGINT) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id FROM range(0, 100)")
    spark.sql(s"DELETE FROM $t WHERE k % 10 = 0")
    val Array(cat, ns, n) = t.split('.')
    val r = spark.sql(s"SELECT min_target_file, max_target_file FROM $cat.$ns.`$n$$deletes`")
      .head()
    assert(r.getString(0).contains("/data/part-") && r.getString(0).length > 64,
      s"delete-file bounds must carry the FULL target path: ${r.getString(0)}")
    spark.sql(s"DROP TABLE $t")
  }
}
