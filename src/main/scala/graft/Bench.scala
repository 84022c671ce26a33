package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. The noop sink forces full materialization of every
  * output column (a bare .count() would let Catalyst prune the plan down to
  * a row count, under-measuring scan+compute).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen once so per-query timings measure the plan, not
    // first-use classloading.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Warm the BENCH-DIR parquet footers + temp-view registration too —
    // otherwise the first measured query pays every table's schema
    // inference (r1: q01 carried ~8s of session overhead).
    try {
      Tables.registerAll(spark, sfDir)
      Tables.names.foreach(n => Tables.t(spark, sfDir, n).write.format("noop").mode("overwrite").save())
    } catch { case _: Throwable => () }
    // Median of 3 runs per query: a one-shot timing lands any GC pause or
    // codegen-compile stall entirely on one query (r2 recorded q25 at 15 s
    // that re-measured at 1.4 s). The median is robust to a single outlier;
    // the max-min spread is reported so variance stays visible.
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // optional arg: comma-separated query names — bench just those (local
    // A/B iteration; the driver passes no args and gets the full sweep).
    // Unknown names fail loudly: a typo'd filter silently benching
    // nothing would masquerade as a measurement.
    val only = args.headOption.map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown bench queries: ${unknown.mkString(", ")}")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to runsPer).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); None
        }
      }
      // CACHE HYGIENE (VERDICT r9 #8): no persisted RDD may survive a
      // query's run — a leaked cache would hand cross-run (and cross-
      // QUERY) warmth to later measurements, flattering them against the
      // baseline. Fail the whole bench loudly: a silent unpersist here
      // would hide the leak the assertion exists to catch.
      val leaked = spark.sparkContext.getPersistentRDDs
      require(leaked.isEmpty,
        s"[bench] $name leaked ${leaked.size} persisted RDD(s): " +
          leaked.values.map(_.name).mkString(", "))
      // Any failed run reports -1 so a broken plan can't silently pass as a
      // fast one (ADVICE r1).
      if (times.size < runsPer) name -> (-1.0, 0.0)
      else {
        val sorted = times.sorted
        name -> (sorted(sorted.size / 2), sorted.last - sorted.head)
      }
    }
    // explicit ROOT locale: the default-locale f"" interpolator renders
    // 0,123 under comma-decimal locales (e.g. de_DE) — invalid JSON
    def num(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    val qs = results.map { case (k, (m, _)) => "\"" + k + "\":" + num(m, 4) }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, (_, s)) => "\"" + k + "\":" + num(s, 4) }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val nFailed = results.count(_._2._1 < 0)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spreads,"runs":$runsPer,"failed":$nFailed,"sf":"$sfDir"}"""
    // STDOUT gets a SLIM variant: the driver's artifact keeps only a byte-
    // bounded tail of stdout, and r10's full line (queries + spreads, ~11 KB
    // at 183 queries) truncated mid-JSON, leaving 68 of 183 per-query times
    // in the committed artifact. Keys compress to the unambiguous qNNN
    // prefix and the map goes LAST in the line (an archived tail keeps the
    // END of stdout), so every per-query number survives ~2.8 KB of tail;
    // the full-name 4-decimal + spread line still lands in the file below.
    val slimQs = results.map { case (k, (m, _)) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + num(m, 3)
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runsPer,"failed":$nFailed,"sf":"$sfDir","queries":$slimQs}""")
    // the driver's artifact truncates long stdout tails — also persist the
    // full per-query medians+spreads so every round's numbers stay auditable
    // (SPARK_GRAFT_BENCH_OUT overrides; committed per round as BENCH_LOCAL_r*)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_round.json")
    try {
      val p = java.nio.file.Paths.get(out)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Exception => System.err.println(s"[bench] write $out: $e") }
    spark.stop()
  }
}
