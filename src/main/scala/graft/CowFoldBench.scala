package graft

/** A/B micro-benchmark for lineage-preserving copy-on-write: the same
  * selective UPDATE (touching one partition out of eight) runs against
  * (A) the default ReplaceData plan — single read of touched files, fresh
  * row ids — and (B) `write.cow.preserve-lineage=true` — the delta
  * capture + fold-on-commit path, which reads touched files twice
  * (find-matching scan + fold) but keeps every row's `_row_id`. Both end
  * in the same table shape (touched files rewritten, zero delete files);
  * the delta is the price of identity. Also reports untouched-partition
  * file stability so the file-granular claim is a measured fact.
  *
  * {{{ sbt "runMain graft.CowFoldBench" }}}
  */
object CowFoldBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_COW_ROWS", "4000000").toLong
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bench")
    spark.range(rows).selectExpr(
        "id % 8 AS p", "id AS k",
        "concat(md5(CAST(id AS STRING)), md5(CAST(id + 3 AS STRING)), " +
          "md5(CAST(id + 7 AS STRING))) AS payload")
      .createOrReplaceTempView("cow_src")

    def run(label: String, preserve: Boolean): Double = {
      val t = "lake.bench.cowf"
      val runs = (1 to 3).map { _ =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"CREATE TABLE $t (p BIGINT, k BIGINT, payload STRING) PARTITIONED BY (p) " +
          s"TBLPROPERTIES ('write.cow.preserve-lineage'='$preserve')")
        spark.sql(s"INSERT INTO $t SELECT * FROM cow_src")
        val before = spark.sql(s"SELECT path FROM lake.bench.`cowf$$files` " +
          "WHERE min_values['p'] <> '3'").collect().map(_.getString(0)).toSet
        val t0 = System.nanoTime()
        spark.sql(s"UPDATE $t SET payload = concat(payload, '!') WHERE p = 3 AND k % 5 = 0")
        val sec = (System.nanoTime() - t0) / 1e9
        val after = spark.sql(s"SELECT path FROM lake.bench.`cowf$$files` " +
          "WHERE min_values['p'] <> '3'").collect().map(_.getString(0)).toSet
        val deletes = spark.sql(s"SELECT count(*) FROM lake.bench.`cowf$$deletes`")
          .head().getLong(0)
        require(after == before, s"$label touched files outside p=3")
        require(deletes == 0, s"$label left $deletes delete files — not CoW shape")
        sec
      }.sorted
      println(f"$label: median ${runs(runs.size / 2)}%.3f s " +
        f"(min ${runs.head}%.3f, max ${runs.last}%.3f)")
      runs(runs.size / 2)
    }

    val replaceData = run("A ReplaceData CoW (default, fresh row ids)", preserve = false)
    val fold = run("B delta+fold CoW (preserves _row_id)", preserve = true)
    println(f"fold overhead: ${fold / replaceData}%.2fx")
    spark.sql("DROP TABLE IF EXISTS lake.bench.cowf")
    spark.stop()
  }
}
