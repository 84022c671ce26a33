package graft

/** A/B micro-benchmark for the split-parallel positional-delete read path:
  * builds one large multi-row-group data file with pending positional
  * tombstones, then times a full scan with (A) a split size larger than
  * the file — exactly the old whole-file single-task read — against (B)
  * the session's normal split size, where the dirty file reads as many
  * parallel row-group-aligned tasks.
  *
  * {{{ sbt "runMain graft.MorSplitBench" }}}
  */
object MorSplitBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_MOR_ROWS", "4000000").toLong
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = "lake.bench.mor_split"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bench")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) TBLPROPERTIES (" +
      "'write.delete.mode'='merge-on-read'," +
      "'write.parquet.row-group-size-bytes'='4194304')") // ~4 MB groups
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      s"concat('v', repeat('x', 48), id) FROM range(0, $rows)")
    spark.sql(s"DELETE FROM $t WHERE id % 101 = 0") // ~1% tombstoned, every group
    val file = spark.sql(s"SELECT path, size_bytes FROM lake.bench.`mor_split$$files`")
      .collect().head
    val layout = graft.catalog.PositionalParquet.rowGroupLayout(
      file.getString(0), spark.sessionState.newHadoopConf())
    println(s"file: ${file.getLong(1) / 1024 / 1024} MiB, ${layout.size} row groups, $rows rows")

    def time(label: String, splitBytes: Long): Double = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", splitBytes.toString)
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val n = spark.sql(s"SELECT sum(id) AS s, count(*) AS n FROM $t").collect()
        require(n(0).getLong(1) == rows - (rows + 100) / 101)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label: median ${runs(runs.size / 2)}%.3f s (min ${runs.head}%.3f, max ${runs.last}%.3f)")
      runs(runs.size / 2)
    }
    // A = the round-7 reader exactly: one whole-file task, row-mode
    System.setProperty("graft.mor.columnar", "false")
    val r7 = time("A whole-file row-mode (round-7 behavior)", file.getLong(1) * 2)
    // B = split-parallel alone (8 splits — a 1 GB dirty file at 128 MB)
    val split = time("B 8 splits, row-mode", math.max(file.getLong(1) / 8, 1L))
    System.clearProperty("graft.mor.columnar")
    // C = the full round-8 path: split-parallel + vectorized batches
    val full = time("C 8 splits, columnar (current default)", math.max(file.getLong(1) / 8, 1L))
    println(f"split speedup: ${r7 / split}%.2fx; columnar on top: ${split / full}%.2fx; " +
      f"combined: ${r7 / full}%.2fx")
    spark.sql(s"DROP TABLE $t")
    spark.stop()
  }
}
