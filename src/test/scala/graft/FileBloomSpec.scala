package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.FileBloom

/** FILE-level bloom skipping: point predicates drop whole files from the
  * plan via per-file blooms carried in manifest SIDECARS — the layer above
  * min/max (useless when values interleave across files) and above parquet
  * row-group blooms (which require opening the file). The needle-lookup
  * path on a 100 TB unsorted column.
  */
class FileBloomSpec extends AnyFunSuite {
  import TestSpark._

  private val scanFiles = "LakeScan\\(lake\\.blm\\.(\\w+), (\\d+) files\\)".r
  private def filesPlanned(plan: String, table: String): Int =
    scanFiles.findAllMatchIn(plan).collect {
      case m if m.group(1) == table => m.group(2).toInt
    }.min

  // ── unit: the filter itself ───────────────────────────────────────────

  test("no false negatives, encode/decode round-trip, plausible fpp") {
    val b = FileBloom(65536)
    val present = (0 until 5000).map(i => s"key-$i")
    present.foreach(b.add)
    present.foreach(k => assert(b.mightContain(k), s"false negative on $k"))
    val decoded = FileBloom.decode(b.encode).get
    present.foreach(k => assert(decoded.mightContain(k), s"false negative after decode on $k"))
    // 5000 keys in 64Ki bits, k=6 → expected fpp well under 5%
    val fp = (0 until 2000).count(i => decoded.mightContain(s"absent-$i"))
    assert(fp < 100, s"fpp implausibly high: $fp/2000")
  }

  test("malformed sidecar payloads decode to no-bloom, never a planning-time crash") {
    // a truncated entry ("6:") used to decode to m=0 and throw
    // ArithmeticException on the first probe — at query planning time
    assert(FileBloom.decode("6:").isEmpty, "empty bit array")
    assert(FileBloom.decode("0:AAAAAAAAAAA=").isEmpty, "k=0")
    assert(FileBloom.decode("-3:AAAAAAAAAAA=").isEmpty, "negative k")
    assert(FileBloom.decode(":abc").isEmpty)
    assert(FileBloom.decode("garbage").isEmpty)
    assert(FileBloom.decode("6:!!!not-base64!!!").isEmpty)
    // a healthy encoding still round-trips
    val b = FileBloom(1024); b.add("x")
    assert(FileBloom.decode(b.encode).exists(_.mightContain("x")))
  }

  test("eq-bloom planning kernel: 100 epochs x 1k files x 20k keys, budget-bounded") {
    // worst case for the refinement: absence everywhere, every probe runs
    // all keys. Hashes precompute once per key (m-independent pair);
    // per-pair work is pure bit reads; the 64M-step budget caps the total.
    val nFiles = 1000
    val blooms = (0 until nFiles).map { i =>
      val b = FileBloom(131072)
      (0 until 2000).foreach(j => b.add(s"k-$i-$j"))
      b
    }
    val keys = Array.tabulate(20000)(j => FileBloom.hashes(s"absent-$j"))
    // hashed probes agree with string probes (the precompute is exact)
    assert(!blooms.head.mightContainHashed(FileBloom.hashes("absent-1")) ==
      !blooms.head.mightContain("absent-1"))
    assert(blooms.head.mightContainHashed(FileBloom.hashes("k-0-7")))
    var budget = 64L * 1000 * 1000
    var refined = 0
    var attempted = 0
    val t0 = System.nanoTime()
    var d = 0
    while (d < 100) {
      var i = 0
      while (i < nFiles) {
        budget -= keys.length
        if (budget >= 0) {
          attempted += 1
          if (!keys.exists(blooms(i).mightContainHashed)) refined += 1
        }
        i += 1
      }
      d += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // within budget nearly every attempted pair is proven clean (a few
    // hit the ~6e-7/probe false-positive rate — "maybe", never wrong);
    // the rest degraded to "maybe" — and the whole pass is fast
    assert(attempted == 3200 && refined > 3000, s"$refined/$attempted")
    assert(sec < 20, f"bounded planning kernel took $sec%.1f s")
    println(f"[eq-bloom-kernel] 64M-step budget = $attempted pairs in $sec%.2f s " +
      f"(${sec * 1e3 / attempted}%.2f ms/pair of 20k absent keys)")
  }

  test("canonical renderings agree across writer and pruner value shapes") {
    import org.apache.spark.sql.types.Decimal
    import org.apache.spark.unsafe.types.UTF8String
    // writer sees java BigDecimal (fixed scale), pruner sees Spark Decimal
    assert(FileBloom.canonical(new java.math.BigDecimal("12.340000")) ==
      FileBloom.canonical(Decimal(BigDecimal("12.34"))))
    // -0.0 == 0.0 in SQL equality: renderings must collide
    assert(FileBloom.canonical(java.lang.Double.valueOf(-0.0)) ==
      FileBloom.canonical(java.lang.Double.valueOf(0.0)))
    assert(FileBloom.canonical(UTF8String.fromString("héllo")) ==
      FileBloom.canonical("héllo"))
    assert(FileBloom.canonical(java.lang.Integer.valueOf(42)) == Some("42"))
    assert(FileBloom.canonical(null).isEmpty)
  }

  // ── integration: planning-time file pruning ───────────────────────────

  /** Ids interleave across files (evens then odds), so every file's
    * [min,max] covers every id — min/max pruning provably can't help; any
    * skipping observed below is the bloom's.
    */
  private def mkInterleaved(table: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql(s"DROP TABLE IF EXISTS lake.blm.$table")
    spark.sql(s"""CREATE TABLE lake.blm.$table (id BIGINT, v STRING)
      TBLPROPERTIES ('write.bloom-columns'='id')""")
    spark.sql(s"INSERT INTO lake.blm.$table SELECT id * 2, concat('e', id) FROM range(1000)")
    spark.sql(s"INSERT INTO lake.blm.$table SELECT id * 2 + 1, concat('o', id) FROM range(1000)")
  }

  test("point lookup plans only the file that can hold the needle") {
    mkInterleaved("t")
    val q = spark.sql("SELECT v FROM lake.blm.t WHERE id = 700") // even file
    assert(q.collect().map(_.getString(0)).toSeq == Seq("e350"))
    assert(filesPlanned(q.queryExecution.executedPlan.toString, "t") == 1,
      "bloom must prune the odd-ids file despite full min/max overlap")
    // absent needle: bloom proves absence everywhere → zero files planned
    val none = spark.sql("SELECT v FROM lake.blm.t WHERE id = 5000")
    assert(none.collect().isEmpty)
    assert(filesPlanned(none.queryExecution.executedPlan.toString, "t") == 0)
    // IN list spanning both files keeps both; results stay exact
    val in = spark.sql("SELECT v FROM lake.blm.t WHERE id IN (700, 701)")
    assert(in.collect().map(_.getString(0)).sorted.toSeq == Seq("e350", "o350"))
  }

  test("string bloom column prunes; non-bloom columns never consult blooms") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql("DROP TABLE IF EXISTS lake.blm.s")
    spark.sql("""CREATE TABLE lake.blm.s (k STRING, n BIGINT)
      TBLPROPERTIES ('write.bloom-columns'='k')""")
    spark.sql("INSERT INTO lake.blm.s SELECT concat('a-', id), id FROM range(500)")
    spark.sql("INSERT INTO lake.blm.s SELECT concat('z-', id), id FROM range(500)")
    val q = spark.sql("SELECT n FROM lake.blm.s WHERE k = 'z-77'")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(77L))
    assert(filesPlanned(q.queryExecution.executedPlan.toString, "s") == 1)
    // eq on the NON-bloom column: files kept (sound, no bloom to consult)
    val q2 = spark.sql("SELECT k FROM lake.blm.s WHERE n = 77")
    assert(q2.collect().map(_.getString(0)).sorted.toSeq == Seq("a-77", "z-77"))
  }

  test("blooms survive manifest merging and partial manifest rewrites") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql("DROP TABLE IF EXISTS lake.blm.m")
    spark.sql("""CREATE TABLE lake.blm.m (id BIGINT, v STRING)
      TBLPROPERTIES ('write.bloom-columns'='id',
                     'commit.manifest-merge.min-count'='2',
                     'commit.manifest-merge.target-entries'='64')""")
    // 4 appends with interleaved ids → manifest merging fires (min-count 2)
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO lake.blm.m SELECT id * 4 + $i, concat('f$i-', id) FROM range(400)"))
    val q = spark.sql("SELECT v FROM lake.blm.m WHERE id = 402") // file 2: 402 = 100*4+2
    assert(q.collect().map(_.getString(0)).toSeq == Seq("f2-100"))
    assert(filesPlanned(q.queryExecution.executedPlan.toString, "m") == 1,
      "bloom sidecars must ride through commit-time manifest merging")
    // partial rewrite: COW DELETE on file 0's rows rewrites that manifest;
    // the untouched files' blooms must survive the rewrite
    spark.sql("DELETE FROM lake.blm.m WHERE id = 400")
    val q2 = spark.sql("SELECT v FROM lake.blm.m WHERE id = 402")
    assert(q2.collect().map(_.getString(0)).toSeq == Seq("f2-100"))
    assert(filesPlanned(q2.queryExecution.executedPlan.toString, "m") == 1,
      "bloom sidecars must survive withRewrite manifest rewrites")
  }

  test("expiration deletes dead sidecars; orphan removal keeps live ones") {
    import org.apache.hadoop.fs.Path
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql("DROP TABLE IF EXISTS lake.blm.x")
    spark.sql("""CREATE TABLE lake.blm.x (id BIGINT)
      TBLPROPERTIES ('write.bloom-columns'='id')""")
    spark.sql("INSERT INTO lake.blm.x SELECT id * 2 FROM range(100)")
    spark.sql("INSERT OVERWRITE lake.blm.x SELECT id * 2 + 1 FROM range(100)")
    val loc = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("blm"), "x")).asInstanceOf[graft.catalog.LakeTable].meta.location
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(loc).getFileSystem(conf)
    def sidecars(): Seq[String] = {
      val dir = new Path(s"$loc/metadata")
      fs.listStatus(dir).map(_.getPath.getName).filter(_.endsWith(".bloom")).toSeq
    }
    assert(sidecars().nonEmpty, "bloom-configured writes must produce sidecars")
    // orphan removal (no grace period) must NOT touch live sidecars
    spark.sql("CALL lake.system.remove_orphan_files(table => 'blm.x', older_than_ms => 0)")
    val afterOrphan = sidecars()
    assert(afterOrphan.nonEmpty, "live sidecars must survive remove_orphan_files")
    // expiring the overwritten snapshot kills its manifests AND sidecars
    spark.sql("CALL lake.system.expire_snapshots(table => 'blm.x', keep_last => 1)")
    assert(sidecars().size < afterOrphan.size,
      "expired manifests' sidecars must be deleted with them")
    // and the surviving table still bloom-prunes
    val q = spark.sql("SELECT id FROM lake.blm.x WHERE id = 84")
    assert(q.collect().isEmpty) // 84 is even → overwritten away
    assert(filesPlanned(q.queryExecution.executedPlan.toString, "x") == 0)
  }

  test("a filtered dim join runtime-prunes fact files via the bloom (no partitioning)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql("DROP TABLE IF EXISTS lake.blm.fact")
    spark.sql("DROP TABLE IF EXISTS lake.blm.dim")
    // UNPARTITIONED fact; ids interleave across files so min/max can't
    // prune — only the per-file bloom can answer the runtime IN-filter
    spark.sql("""CREATE TABLE lake.blm.fact (id BIGINT, v BIGINT)
      TBLPROPERTIES ('write.bloom-columns'='id')""")
    spark.sql("INSERT INTO lake.blm.fact SELECT id * 2, id FROM range(1000)")
    spark.sql("INSERT INTO lake.blm.fact SELECT id * 2 + 1, id FROM range(1000)")
    spark.sql("CREATE TABLE lake.blm.dim (id BIGINT, attr STRING)")
    spark.sql(
      "INSERT INTO lake.blm.dim SELECT id * 2, IF(id = 111, 'hit', 'miss') FROM range(500)")
    val q = spark.sql(
      """SELECT f.id, f.v FROM lake.blm.fact f JOIN lake.blm.dim d ON f.id = d.id
        |WHERE d.attr = 'hit'""".stripMargin)
    val rows = q.collect()
    assert(rows.toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((222L, 111L)))
    val plan = q.queryExecution.executedPlan.toString
    if (plan.contains("dynamicpruning")) {
      // the runtime IN-filter carries only EVEN ids → the odd-ids file is
      // bloom-provably matchless and must drop from the fact scan
      val scanDesc = "LakeScan\\(lake\\.blm\\.fact, (\\d+) files\\)".r
      val counts = scanDesc.findAllMatchIn(plan).map(_.group(1).toInt).toSeq
      assert(counts.nonEmpty && counts.min == 1,
        s"bloom runtime filter should prune the fact scan to 1 file, got $counts:\n$plan")
    } else fail(s"expected a dynamic pruning predicate on the fact scan:\n$plan")
  }

  test("LIKE 'prefix%' plans only the covering run of a sorted string column") {
    // min/max sibling of the bloom path (same pruner): matching strings
    // form [p, next(p)) in UTF8-binary order
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql("DROP TABLE IF EXISTS lake.blm.p")
    spark.sql("CREATE TABLE lake.blm.p (k STRING, n BIGINT)")
    // three files with disjoint lexical ranges: a-*, m-*, z-* (REPARTITION(1)
    // pins one file per insert — range() otherwise splits across tasks)
    Seq("a", "m", "z").foreach(pfx =>
      spark.sql(s"INSERT INTO lake.blm.p SELECT /*+ REPARTITION(1) */ concat('$pfx-', lpad(id, 4, '0')), id FROM range(500)"))
    val q = spark.sql("SELECT n FROM lake.blm.p WHERE k LIKE 'm-02%'")
    assert(q.collect().length == 100) // m-0200..m-0299
    assert(filesPlanned(q.queryExecution.executedPlan.toString, "p") == 1,
      "prefix predicate must plan only the file whose range covers it")
    val none = spark.sql("SELECT n FROM lake.blm.p WHERE k LIKE 'q%'")
    assert(none.collect().isEmpty)
    assert(filesPlanned(none.queryExecution.executedPlan.toString, "p") == 0)
  }

  test("CoW MERGE rewrites only the files whose blooms may hold a matched key") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql("DROP TABLE IF EXISTS lake.blm.cw")
    spark.sql("""CREATE TABLE lake.blm.cw (id BIGINT, v BIGINT)
      TBLPROPERTIES ('write.bloom-columns'='id')""")
    spark.sql("INSERT INTO lake.blm.cw SELECT id * 2, id FROM range(1000)")
    spark.sql("INSERT INTO lake.blm.cw SELECT id * 2 + 1, id FROM range(1000)")
    def paths(): Set[String] = spark.sql("SELECT path FROM lake.blm.`cw$files`")
      .collect().map(_.getString(0)).toSet
    val before = paths()
    assert(before.size >= 2)
    // the source hits ONE even id → min/max keeps the even AND odd file
    // covering 222's range, the bloom excludes the odd one: exactly one
    // file rewrites, every other file survives the copy-on-write by
    // reference
    spark.sql(
      """MERGE INTO lake.blm.cw t
        |USING (SELECT 222 AS id, -1L AS v) s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    val after = paths()
    assert(spark.sql("SELECT v FROM lake.blm.cw WHERE id = 222").head().getLong(0) == -1L)
    assert(spark.table("lake.blm.cw").count() == 2000)
    assert((before & after).size == before.size - 1,
      s"all but the one bloom-matched file must carry over by reference " +
        s"(before=${before.size}, carried=${(before & after).size})")
  }

  test("compaction rebuilds blooms: a merged file still proves absence") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql("DROP TABLE IF EXISTS lake.blm.c")
    spark.sql("""CREATE TABLE lake.blm.c (id BIGINT, v BIGINT)
      TBLPROPERTIES ('write.bloom-columns'='id')""")
    // sparse ids (4k, 4k+1): values 4k+2 are absent but inside min/max
    spark.sql("INSERT INTO lake.blm.c SELECT id * 4, id FROM range(500)")
    spark.sql("INSERT INTO lake.blm.c SELECT id * 4 + 1, id FROM range(500)")
    spark.sql("CALL lake.system.compact('blm.c')")
    val hit = spark.sql("SELECT v FROM lake.blm.c WHERE id = 400")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(100L))
    // in-range absent needle: only the REBUILT bloom of the merged file
    // can prove this (min/max covers 402)
    val none = spark.sql("SELECT v FROM lake.blm.c WHERE id = 402")
    assert(none.collect().isEmpty)
    assert(filesPlanned(none.queryExecution.executedPlan.toString, "c") == 0,
      "the compacted file's rebuilt bloom must prove in-range absence")
  }

  test("TINYINT bloom column: writer and pruner renderings agree") {
    // regression: scalarAt had no ByteType case, so a TINYINT bloom was
    // always empty and "proved" every present value absent
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql("DROP TABLE IF EXISTS lake.blm.by")
    spark.sql("""CREATE TABLE lake.blm.by (b TINYINT, n BIGINT)
      TBLPROPERTIES ('write.bloom-columns'='b')""")
    spark.sql("INSERT INTO lake.blm.by SELECT CAST(id % 100 AS TINYINT), id FROM range(500)")
    val rows = spark.sql("SELECT n FROM lake.blm.by WHERE b = CAST(5 AS TINYINT)")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(5L, 105L, 205L, 305L, 405L),
      s"present TINYINT value must not be bloom-pruned away, got $rows")
  }

  test("bloom pruning stays sound under merge-on-read tombstones") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.blm")
    spark.sql("DROP TABLE IF EXISTS lake.blm.d")
    spark.sql("""CREATE TABLE lake.blm.d (id BIGINT, v STRING)
      TBLPROPERTIES ('write.bloom-columns'='id', 'write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO lake.blm.d SELECT id * 2, concat('e', id) FROM range(500)")
    spark.sql("INSERT INTO lake.blm.d SELECT id * 2 + 1, concat('o', id) FROM range(500)")
    spark.sql("DELETE FROM lake.blm.d WHERE id = 700")
    // tombstoned needle: bloom still keeps the file (it holds the physical
    // row), the tombstone kills it at read — absence is correct
    assert(spark.sql("SELECT v FROM lake.blm.d WHERE id = 700").collect().isEmpty)
    // untouched needle in the same file still found, still 1-file plan
    val q = spark.sql("SELECT v FROM lake.blm.d WHERE id = 702")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("e351"))
    assert(filesPlanned(q.queryExecution.executedPlan.toString, "d") == 1)
  }
}
