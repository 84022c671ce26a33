package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.StatBounds

/** Non-finite doubles in file statistics: a file containing NaN records
  * max = "NaN" (java Double ordering — exactly Spark SQL's NaN-greatest
  * semantics), and ±Infinity render as unparseable-for-BigDecimal tokens.
  * Every stats consumer must compare these in Spark's numeric order —
  * never crash on the parse, and never fall back to lexical comparison
  * (where "10.0" < "9.0" < "Infinity" < "NaN" is nonsense and once caused
  * a wrong prune in the runtime-filter path).
  */
class NanStatsSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  test("StatBounds.numCmp: Spark ordering over non-finite tokens, exact over finite") {
    def c(a: String, b: String) = StatBounds.numCmp(a, b).get
    assert(c("NaN", "Infinity") > 0 && c("Infinity", "1e300") > 0)
    assert(c("-Infinity", "-1e300") < 0 && c("NaN", "NaN") == 0)
    assert(c("10.0", "9.0") > 0) // lexical would say "10.0" < "9.0"
    assert(c("9007199254740993", "9007199254740992") > 0, "exact beyond 2^53")
    assert(StatBounds.numCmp("abc", "1").isEmpty)
  }

  test("files with NaN/Infinity rows: stats survive, pruning sound, no crashes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.nan")
    val t = s"lake.nan.${uniq("d")}"
    spark.sql(s"CREATE TABLE $t (k BIGINT, d DOUBLE)")
    // file 1: finite values + NaN + Infinity; file 2: small finite values
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      "CASE WHEN id = 0 THEN double('NaN') WHEN id = 1 THEN double('Infinity') " +
      "ELSE CAST(9.0 + id AS DOUBLE) END FROM range(0, 50)")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id + 100, CAST(id AS DOUBLE) / 10 " +
      "FROM range(0, 50)")
    val Array(_, ns, n) = t.split('.')
    val maxes = spark.sql(s"SELECT max_values['d'] FROM lake.$ns.`$n$$files`")
      .collect().map(_.getString(0)).toSet
    assert(maxes.contains("NaN"), s"NaN is the max in Spark's order: $maxes")

    // equality probe inside the NaN file's finite range: the file must be
    // kept (numCmp treats max=NaN as greatest), the clean file pruned
    val q = spark.sql(s"SELECT k FROM $t WHERE d = 11.0")
    assert(q.queryExecution.executedPlan.toString.contains("1 files"),
      s"expected the clean file pruned:\n${q.queryExecution.executedPlan}")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))

    // Spark semantics: NaN and Infinity are both > any finite threshold
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE d > 1e9").head().getLong(0) == 2)
    // top-N pruning path over a column with non-finite stats: no crash,
    // NaN sorts greatest, then Infinity
    val top = spark.sql(s"SELECT k, d FROM $t ORDER BY d DESC LIMIT 2").collect()
    assert(top(0).getDouble(1).isNaN && top(1).getDouble(1).isInfinity)
    // metadata-only min/max pushdown returns Spark's answers (max = NaN)
    val mm = spark.sql(s"SELECT min(d) AS mn, max(d) AS mx FROM $t").head()
    assert(mm.getDouble(0) == 0.0 && mm.getDouble(1).isNaN)
    spark.sql(s"DROP TABLE $t")
  }
}
