package graft

/** Runs ONE registered query and prints its rows — the correctness twin of
  * [[BenchOne]]: iterate on a query's semantics (against the local DuckDB
  * oracle) without paying a full Verify sweep.
  *
  * {{{ sbt "runMain graft.RunOne q64_merge_equality /root/testdata/sf0.01" }}}
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val rows = df.collect()
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
    println(s"=== $name: ${rows.length} rows ===")
    println(df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    rows.take(100).foreach(r => println(r.toString))
    spark.stop()
  }
}
