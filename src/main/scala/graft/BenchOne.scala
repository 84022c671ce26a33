package graft

/** Times ONE registered query (median of N runs) — the micro-benchmark
  * loop for plan iteration without paying a full Bench sweep.
  *
  * {{{ sbt "runMain graft.BenchOne q53_ngram_jaccard_join 5" }}}
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"$name: median ${times(times.size / 2)}%.3f s, min ${times.head}%.3f, max ${times.last}%.3f ($runs runs)")
    spark.stop()
  }
}
