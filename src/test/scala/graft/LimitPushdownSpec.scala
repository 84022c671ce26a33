package graft

import org.scalatest.funsuite.AnyFunSuite

/** Limit / top-N FILE pruning (SupportsPushDownLimit / SupportsPushDownTopN,
  * both partial): LIMIT n plans only a row-count-covering prefix of files,
  * and ORDER BY k LIMIT n over range-sorted files plans only the files that
  * can hold one of the n extreme values. Spark re-applies the operator, so
  * results are untouched — the win is not planning 10k splits to fetch 10
  * rows.
  */
class LimitPushdownSpec extends AnyFunSuite {
  import TestSpark._

  private val scanFiles = "LakeScan\\(lake\\.lim\\.(\\w+), (\\d+) files\\)".r

  private def filesPlanned(plan: String, table: String): Int =
    scanFiles.findAllMatchIn(plan).collect {
      case m if m.group(1) == table => m.group(2).toInt
    }.min

  test("LIMIT n plans only a covering prefix of files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.lim")
    spark.sql("DROP TABLE IF EXISTS lake.lim.t")
    spark.sql("CREATE TABLE lake.lim.t (v BIGINT)")
    (0 until 6).foreach(i =>
      spark.sql(s"INSERT INTO lake.lim.t SELECT id + ${i * 100} FROM range(100)"))
    val q = spark.sql("SELECT * FROM lake.lim.t LIMIT 5")
    assert(q.collect().length == 5)
    val planned = filesPlanned(q.queryExecution.executedPlan.toString, "t")
    assert(planned == 1, s"LIMIT 5 over 6x100-row files must plan 1 file, got $planned")
    // no limit -> all files
    val full = spark.table("lake.lim.t")
    assert(full.count() == 600)
  }

  test("ORDER BY k LIMIT n on a range-sorted table plans only the extreme files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.lim")
    spark.sql("DROP TABLE IF EXISTS lake.lim.s")
    spark.sql("CREATE TABLE lake.lim.s (k BIGINT, v BIGINT)")
    // disjoint per-file k ranges (the layout range-distributed sorted
    // writes produce at scale, minus AQE coalescing these tiny inserts)
    (0 until 5).foreach(i =>
      spark.sql(s"INSERT INTO lake.lim.s SELECT id + ${i * 2000}, id FROM range(2000)"))
    val nFiles = spark.sql("SELECT count(*) FROM lake.lim.`s$files`").head().getLong(0)
    assert(nFiles > 1, s"need multiple files, got $nFiles")

    // disjoint ranges -> the 3 smallest keys live in exactly one file
    val asc = spark.sql("SELECT * FROM lake.lim.s ORDER BY k LIMIT 3")
    assert(asc.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val ascPlanned = filesPlanned(asc.queryExecution.executedPlan.toString, "s")
    assert(ascPlanned == 1,
      s"top-3 ascending must prune to 1 file ($ascPlanned of $nFiles planned)")

    val desc = spark.sql("SELECT * FROM lake.lim.s ORDER BY k DESC LIMIT 3")
    assert(desc.collect().map(_.getLong(0)).toSeq == Seq(9999L, 9998L, 9997L))
    val descPlanned = filesPlanned(desc.queryExecution.executedPlan.toString, "s")
    assert(descPlanned == 1,
      s"top-3 descending must prune to 1 file ($descPlanned of $nFiles planned)")
  }

  test("ORDER BY a STRING column LIMIT n prunes in binary string order") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.lim")
    spark.sql("DROP TABLE IF EXISTS lake.lim.str")
    spark.sql("CREATE TABLE lake.lim.str (name STRING, v BIGINT)")
    // disjoint lexicographic ranges per file: a*, b*, c*, d*
    Seq("a", "b", "c", "d").foreach(p =>
      spark.sql(s"INSERT INTO lake.lim.str SELECT concat('$p', id), id FROM range(500)"))
    val nFiles = spark.sql("SELECT count(*) FROM lake.lim.`str$files`").head().getLong(0)
    val q = spark.sql("SELECT * FROM lake.lim.str ORDER BY name LIMIT 3")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("a0", "a1", "a10"))
    val planned = scanFiles.findAllMatchIn(q.queryExecution.executedPlan.toString)
      .collect { case m if m.group(1) == "str" => m.group(2).toInt }.min
    // the a* files' lexicographic ranges overlap each other but exclude
    // b*/c*/d* — pruning keeps only the a* quarter
    assert(planned < nFiles && planned <= nFiles / 4,
      s"string top-3 must prune to the a* files, got $planned of $nFiles")
  }

  test("positional tombstones widen the pruning slack instead of disabling it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.lim")
    spark.sql("DROP TABLE IF EXISTS lake.lim.d")
    spark.sql(
      "CREATE TABLE lake.lim.d (v BIGINT) TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO lake.lim.d SELECT id + ${i * 10} FROM range(10)"))
    // kill 9 early rows: a naive LIMIT-8 prefix would under-deliver; the
    // 9 tombstone rows widen the prefix to n + 9 = 17 physical rows —
    // correct AND still a strict prefix of the 30-row file set
    spark.sql("DELETE FROM lake.lim.d WHERE v < 9")
    val q = spark.sql("SELECT * FROM lake.lim.d LIMIT 8")
    assert(q.collect().length == 8, "limit must still deliver 8 live rows")
    val planned = filesPlanned(q.queryExecution.executedPlan.toString, "d")
    val nFiles = spark.sql("SELECT count(*) FROM lake.lim.`d$files`").head().getLong(0)
    assert(planned < nFiles, s"slack-widened prefix must still prune ($planned of $nFiles)")
  }

  test("equality deletes still disable limit pruning (kill count not metadata-derivable)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.lim")
    spark.sql("DROP TABLE IF EXISTS lake.lim.e")
    spark.sql("CREATE TABLE lake.lim.e (k BIGINT, v STRING)")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO lake.lim.e SELECT id + ${i * 10}, 'base' FROM range(10)"))
    // an upsert epoch leaves eq-delete files pending
    spark.sql("SELECT id AS k, 'up' AS v FROM range(0, 5)")
      .createOrReplaceTempView("lim_e_up")
    spark.sql("CALL lake.system.upsert('lim.e', 'lim_e_up', 'k')")
    val q = spark.sql("SELECT * FROM lake.lim.e LIMIT 12")
    assert(q.collect().length == 12, "limit must deliver 12 live rows")
    val planned = filesPlanned(q.queryExecution.executedPlan.toString, "e")
    val nFiles = spark.sql("SELECT count(*) FROM lake.lim.`e$files`").head().getLong(0)
    assert(planned == nFiles, s"eq-dirty scan must refuse pruning ($planned of $nFiles)")
  }
}
