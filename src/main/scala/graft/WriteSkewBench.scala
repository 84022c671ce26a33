package graft

/** A/B micro-benchmark for the non-strict write-clustering path: inserts a
  * heavily skewed dataset (95% of rows share one partition value) into an
  * identity-partitioned lake table with (A) strict clustering — the
  * pre-round-8 behavior, where the hot value is one shuffle partition =
  * one straggler write task — against (B) the default AQE rebalance,
  * where the hot value splits across tasks at the advisory size and small
  * values coalesce. Also reports the per-value file counts so the layout
  * cost of the split (more files for the hot value) is visible next to
  * the wall-clock win.
  *
  * {{{ sbt "runMain graft.WriteSkewBench" }}}
  */
object WriteSkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "4000000").toLong
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bench")
    // incompressible-ish ~96-byte payload: shuffle bytes track row counts
    spark.range(rows).selectExpr(
        "IF(id % 20 = 0, 1 + id % 11, 0) AS p",
        "concat(md5(CAST(id AS STRING)), md5(CAST(id + 3 AS STRING)), " +
          "md5(CAST(id + 7 AS STRING))) AS payload")
      .createOrReplaceTempView("skew_src")

    def run(label: String, strict: Boolean): Double = {
      val t = "lake.bench.wskew"
      val runs = (1 to 3).map { _ =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"CREATE TABLE $t (p BIGINT, payload STRING) PARTITIONED BY (p) " +
          s"TBLPROPERTIES ('write.distribution.strictly-required'='$strict', " +
          "'write.spark.advisory-partition-size-bytes'='33554432')") // 32 MB target
        val t0 = System.nanoTime()
        spark.sql(s"INSERT INTO $t SELECT * FROM skew_src")
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val files = spark.sql(s"SELECT min_values['p'] AS v, count(*) AS files " +
        s"FROM lake.bench.`wskew$$files` GROUP BY 1 ORDER BY files DESC")
        .collect().map(r => s"p=${r.getString(0)}:${r.getLong(1)}")
      println(f"$label: median ${runs(runs.size / 2)}%.3f s " +
        f"(min ${runs.head}%.3f, max ${runs.last}%.3f); files ${files.mkString(" ")}")
      runs(runs.size / 2)
    }

    val strict = run("A strict clustering (one task per partition value)", strict = true)
    val rebal = run("B AQE rebalance (default)", strict = false)
    println(f"rebalance speedup: ${strict / rebal}%.2fx")
    spark.sql("DROP TABLE IF EXISTS lake.bench.wskew")
    spark.stop()
  }
}
