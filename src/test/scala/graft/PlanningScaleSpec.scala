package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Driver-side planning at big-metadata scale: a 100 TB table at 128 MB a
  * file is ~800k manifest entries; this spec synthesizes a 100k-entry
  * table document (metadata only — no data files exist) and pins that the
  * commit, the pruned planning pass and the bloom-sidecar laziness all
  * stay bounded. Measured costs are recorded in SURVEY §limitations.
  */
class PlanningScaleSpec extends AnyFunSuite {
  import TestSpark._

  private val scanFiles = """LakeScan\(lake\.scale\.(\w+), (\d+) files\)""".r
  private def filesPlanned(plan: String, table: String): Int =
    scanFiles.findAllMatchIn(plan).collect {
      case m if m.group(1) == table => m.group(2).toInt
    }.min

  test("100k-entry metadata: bounded commit, bounded pruning, lazy sidecars") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.scale")
    spark.sql("DROP TABLE IF EXISTS lake.scale.big")
    spark.sql("CREATE TABLE lake.scale.big (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.bloom-columns'='k')")
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[LakeCatalog]
    val table = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("scale"), "big"))
      .asInstanceOf[LakeTable]
    val conf = spark.sessionState.newHadoopConf()
    val n = 100000
    // each entry carries a real (tiny) bloom so the sidecar strip/write
    // path runs at full width; disjoint k ranges of 1000 per file
    val bl = { val b = FileBloom(512); b.add("42"); b.encode }
    val files = (0 until n).map { i =>
      DataFileMeta(s"${table.meta.location}/data/synth-$i.parquet",
        1000L, 128L * 1024 * 1024,
        minValues = Map("k" -> (i.toLong * 1000).toString),
        maxValues = Map("k" -> (i.toLong * 1000 + 999).toString),
        nullCounts = Map("k" -> 0L, "v" -> 0L),
        blooms = Map("k" -> bl))
    }
    // the file the one-file planning check below selects must exist on
    // disk (partition planning stats it); content is irrelevant
    spark.range(1).selectExpr("id AS k", "'x' AS v").coalesce(1)
      .write.mode("overwrite").parquet(s"${table.meta.location}/tmp_seed")
    val seed = new java.io.File(s"${table.meta.location}/tmp_seed").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"${table.meta.location}/data"))
    java.nio.file.Files.copy(seed.toPath,
      java.nio.file.Paths.get(s"${table.meta.location}/data/synth-123.parquet"))

    val t0 = System.nanoTime()
    new LakeBatchWrite(table, table.meta.schema, false, cat.pointerStore, conf)
      .commit(Array(LakeCommitMessage(files)))
    val commitS = (System.nanoTime() - t0) / 1e9

    // planning a miss-everything range: prunes all 100k entries on the
    // driver, touches zero data files and zero bloom sidecars
    val before = ManifestIO.bloomSidecarReads.get()
    val t1 = System.nanoTime()
    val miss = spark.sql("SELECT * FROM lake.scale.big WHERE k < 0")
    assert(miss.collect().isEmpty)
    val missS = (System.nanoTime() - t1) / 1e9
    assert(filesPlanned(miss.queryExecution.executedPlan.toString, "big") == 0)
    assert(ManifestIO.bloomSidecarReads.get() == before,
      "a range predicate must not load bloom sidecars")

    // a one-file range plans exactly 1 of 100k entries, still no sidecars
    val t2 = System.nanoTime()
    val one = spark.table("lake.scale.big").where("k >= 123000 AND k < 123500")
    val onePlan = one.queryExecution.executedPlan.toString
    val oneS = (System.nanoTime() - t2) / 1e9
    assert(filesPlanned(onePlan, "big") == 1)
    assert(ManifestIO.bloomSidecarReads.get() == before)

    // a POINT predicate consults the sidecar (lazily, only now) and the
    // bloom disproves the needle in the one range-surviving file
    val point = spark.sql("SELECT * FROM lake.scale.big WHERE k = 500")
    assert(point.collect().isEmpty)
    assert(ManifestIO.bloomSidecarReads.get() > before,
      "point predicate on a bloom column must load the sidecar")
    assert(filesPlanned(point.queryExecution.executedPlan.toString, "big") == 0)

    // generous CI-safe ceilings; measured values go to SURVEY
    assert(commitS < 120, f"100k-entry commit took $commitS%.1f s")
    assert(missS < 30, f"100k-entry pruning pass took $missS%.1f s")
    println(f"[planning-scale] n=$n commit=$commitS%.2f s " +
      f"miss-plan=$missS%.2f s (${missS * 1e6 / n}%.1f µs/entry) " +
      f"one-file-plan=$oneS%.2f s")
    spark.sql("DROP TABLE lake.scale.big")
  }

  test("manifest-level skip: a selective scan opens only matching manifests") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.scale")
    spark.sql("DROP TABLE IF EXISTS lake.scale.manif")
    // merge would fold the 50 manifests back together — disable it so the
    // skip (not the merge) is what bounds the reads
    spark.sql("CREATE TABLE lake.scale.manif (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('commit.manifest-merge.enabled'='false')")
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[LakeCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("scale"), "manif")
    val conf = spark.sessionState.newHadoopConf()
    val nManifests = 50
    val perManifest = 2000
    // one commit per manifest, k-disjoint: manifest m covers
    // [m*2e6, m*2e6 + 2e6)
    (0 until nManifests).foreach { m =>
      val table = cat.loadTable(ident).asInstanceOf[LakeTable]
      val files = (0 until perManifest).map { i =>
        val lo = m.toLong * 2000000 + i.toLong * 1000
        DataFileMeta(s"${table.meta.location}/data/m$m-$i.parquet",
          1000L, 128L * 1024 * 1024,
          minValues = Map("k" -> lo.toString),
          maxValues = Map("k" -> (lo + 999).toString),
          nullCounts = Map("k" -> 0L))
      }
      new LakeBatchWrite(table, table.meta.schema, false, cat.pointerStore, conf)
        .commit(Array(LakeCommitMessage(files)))
    }
    // fresh handle; the summaries rode each commit's manifest write
    val t = cat.loadTable(ident).asInstanceOf[LakeTable]
    assert(t.meta.currentFiles.size == nManifests * perManifest)
    // the file the one-file plan below selects must exist on disk (the
    // parquet delegate stats it); content is irrelevant
    spark.range(1).selectExpr("id AS k", "'x' AS v").coalesce(1)
      .write.mode("overwrite").parquet(s"${t.meta.location}/tmp_seed")
    val seed = new java.io.File(s"${t.meta.location}/tmp_seed").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"${t.meta.location}/data"))
    java.nio.file.Files.copy(seed.toPath,
      java.nio.file.Paths.get(s"${t.meta.location}/data/m3-1.parquet"))

    // a one-manifest range: planning must OPEN only that manifest (the
    // read counter counts resolutions before the cache, so write-time
    // pre-caching cannot hide reads) and SKIP the other 49
    val reads0 = ManifestIO.manifestReads.get()
    val skips0 = ManifestIO.manifestsSkipped.get()
    val one = spark.table("lake.scale.manif")
      .where("k >= 6001000 AND k < 6002000") // manifest 3, one file
    val onePlan = one.queryExecution.executedPlan.toString
    assert(filesPlanned(onePlan, "manif") == 1, s"plan:\n$onePlan")
    val openedOne = ManifestIO.manifestReads.get() - reads0
    val skippedOne = ManifestIO.manifestsSkipped.get() - skips0
    assert(skippedOne >= nManifests - 1,
      s"expected >= ${nManifests - 1} manifests skipped, got $skippedOne")
    assert(openedOne <= 3, // the matching manifest (a couple of plan passes)
      s"a one-manifest query resolved $openedOne manifests — skip not engaged")

    // a miss-everything predicate opens NOTHING
    val reads1 = ManifestIO.manifestReads.get()
    val skips1 = ManifestIO.manifestsSkipped.get()
    assert(spark.sql("SELECT * FROM lake.scale.manif WHERE k < 0").collect().isEmpty)
    assert(ManifestIO.manifestReads.get() == reads1,
      "a provably-empty scan must not open any manifest")
    assert(ManifestIO.manifestsSkipped.get() - skips1 >= nManifests)

    // a filterless scan still covers every file (the skip never drops
    // coverage without a predicate) — asserted via scan statistics, since
    // the synthetic data files don't exist for a real full read
    val fullScan = t.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of())).build()
    val fullRows = fullScan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().numRows().getAsLong
    assert(fullRows == nManifests.toLong * perManifest * 1000, s"got $fullRows")
    println(s"[planning-scale] manifest-skip: 1-manifest query opened " +
      s"$openedOne/$nManifests manifests, skipped $skippedOne")
    spark.sql("DROP TABLE lake.scale.manif")
  }

  test("write.manifest-summary.columns bounds summaries to the listed columns") {
    // wide-table posture: summaries are per-manifest but default to EVERY
    // stat column, so a 500-column table pays O(columns) manifest-list
    // bytes; the property folds only the listed columns — unlisted ones
    // lose manifest-level skip (conservative), never correctness
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.scale")
    spark.sql("DROP TABLE IF EXISTS lake.scale.wide")
    spark.sql("CREATE TABLE lake.scale.wide (k BIGINT, v STRING) TBLPROPERTIES (" +
      "'write.manifest-summary.columns'='k', 'commit.manifest-merge.enabled'='false')")
    spark.sql("INSERT INTO lake.scale.wide SELECT /*+ REPARTITION(1) */ id, concat('a', id) FROM range(0, 100)")
    spark.sql("INSERT INTO lake.scale.wide SELECT /*+ REPARTITION(1) */ id, concat('b', id) FROM range(100000, 100100)")
    val sums = spark.sql("SELECT summary_mins FROM lake.scale.`wide$manifests`").collect()
    assert(sums.length == 2)
    assert(sums.forall(_.getAs[Map[String, String]]("summary_mins").keySet == Set("k")),
      s"only 'k' may fold: ${sums.map(_.getAs[Map[String, String]]("summary_mins").keySet).toSeq}")
    // skip still engages on the listed column...
    val skips0 = ManifestIO.manifestsSkipped.get()
    assert(spark.sql("SELECT v FROM lake.scale.wide WHERE k = 100001").collect()
      .map(_.getString(0)).toSeq == Seq("b100001"))
    assert(ManifestIO.manifestsSkipped.get() - skips0 >= 1)
    // ...and an unlisted-column predicate conservatively opens everything
    // (correct answer, no skip)
    assert(spark.sql("SELECT k FROM lake.scale.wide WHERE v = 'a42'").collect()
      .map(_.getLong(0)).toSeq == Seq(42L))
    spark.sql("DROP TABLE lake.scale.wide")
  }

  test("pos-delete skip: tombstones stamped with target-partition bounds are skippable") {
    // MoR DELETE in partition 1 stamps its tombstone files with the
    // targets' partition bounds (p in [1,1]); a scan of partition 2 must
    // skip the delete manifest at planning, a scan of partition 1 must
    // still apply the tombstones
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.scale")
    spark.sql("DROP TABLE IF EXISTS lake.scale.posskip")
    spark.sql("CREATE TABLE lake.scale.posskip (p BIGINT, k BIGINT) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read', " +
      "'commit.manifest-merge.enabled'='false')")
    spark.sql("INSERT INTO lake.scale.posskip SELECT id % 2 + 1, id FROM range(0, 100)")
    spark.sql("DELETE FROM lake.scale.posskip WHERE p = 1 AND k < 50")
    // the tombstone entries carry the targets' p-bounds
    val dels = spark.sql("SELECT summary_mins, summary_maxs FROM " +
      "lake.scale.`posskip$manifests` WHERE content = 'deletes'").collect()
    assert(dels.nonEmpty)
    assert(dels.forall(r => r.getAs[Map[String, String]]("summary_mins").get("p").contains("1")
      && r.getAs[Map[String, String]]("summary_maxs").get("p").contains("1")),
      s"tombstones must carry target-partition bounds: ${dels.toSeq}")
    // partition-2 scan: delete manifests skipped, every p=2 row present
    val skips0 = ManifestIO.manifestsSkipped.get()
    assert(spark.sql("SELECT count(*) FROM lake.scale.posskip WHERE p = 2")
      .head().getLong(0) == 50)
    assert(ManifestIO.manifestsSkipped.get() - skips0 >= dels.length,
      "the p=1 tombstone manifest must be skipped for a p=2 scan")
    // partition-1 scan: tombstones APPLY (k < 50 gone)
    assert(spark.sql("SELECT count(*), coalesce(min(k), -1) FROM lake.scale.posskip WHERE p = 1")
      .head() match { case r => r.getLong(0) == 25 && r.getLong(1) >= 50 })
    // filterless scan: full MoR semantics, nothing skipped silently
    assert(spark.table("lake.scale.posskip").count() == 75)
    spark.sql("DROP TABLE lake.scale.posskip")
  }

  test("pos-delete skip holds for DELETION VECTORS too (same stamping path)") {
    // DV entries ride the same commit message and get the same
    // target-partition bounds; the skip must engage identically
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.scale")
    spark.sql("DROP TABLE IF EXISTS lake.scale.dvskip")
    spark.sql("CREATE TABLE lake.scale.dvskip (p BIGINT, k BIGINT) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read', " +
      "'write.delete.format'='dv', 'commit.manifest-merge.enabled'='false')")
    spark.sql("INSERT INTO lake.scale.dvskip SELECT id % 2 + 1, id FROM range(0, 100)")
    spark.sql("DELETE FROM lake.scale.dvskip WHERE p = 1 AND k < 50")
    val dels = spark.sql("SELECT summary_mins FROM lake.scale.`dvskip$manifests` " +
      "WHERE content = 'deletes'").collect()
    assert(dels.nonEmpty &&
      dels.forall(_.getAs[Map[String, String]]("summary_mins").get("p").contains("1")))
    val skips0 = ManifestIO.manifestsSkipped.get()
    assert(spark.sql("SELECT count(*) FROM lake.scale.dvskip WHERE p = 2")
      .head().getLong(0) == 50)
    assert(ManifestIO.manifestsSkipped.get() - skips0 >= dels.length)
    assert(spark.sql("SELECT count(*) FROM lake.scale.dvskip WHERE p = 1")
      .head().getLong(0) == 25)
    assert(spark.table("lake.scale.dvskip").count() == 75)
    spark.sql("DROP TABLE lake.scale.dvskip")
  }

  test("eq-delete planning skip at scale: 100 epochs, a key probe opens one manifest") {
    // a streaming-CDC table between compactions: one eq-delete manifest
    // per epoch, key ranges disjoint (epoch m upserted keys
    // [m*1000, m*1000+999]); a key point lookup must open O(matching)
    // manifests, not O(epochs) — the eq twin of the data-side skip
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("graft-eqskip").toString
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    var meta = TableMeta.empty(dir, schema, Nil,
      Map("commit.manifest-merge.enabled" -> "false"))
    val epochs = 100
    (0 until epochs).foreach { m =>
      val del = DataFileMeta(s"$dir/data/eq-$m.parquet", 100L, 1024L,
        minValues = Map("k" -> (m.toLong * 1000).toString),
        maxValues = Map("k" -> (m.toLong * 1000 + 999).toString),
        nullCounts = Map("k" -> 0L))
      meta = TableMeta.withDelta(meta, "upsert", Nil, Seq(del), conf, "eq-deletes")
    }
    val sn = meta.snapshot(meta.currentSnapshotId).get
    assert(meta.eqDeleteFilesOf(sn).size == epochs) // filterless = everything
    val kAttr = ce.AttributeReference("k", LongType)()
    val reads0 = ManifestIO.manifestReads.get()
    val skips0 = ManifestIO.manifestsSkipped.get()
    val hit = meta.eqDeleteFilesMatching(sn, Seq(ce.EqualTo(kAttr, ce.Literal(42042L))))
    assert(hit.map(_.minValues("k")) == Seq("42000"),
      s"expected exactly epoch 42's tombstones, got ${hit.map(_.minValues)}")
    assert(ManifestIO.manifestsSkipped.get() - skips0 == epochs - 1)
    assert(ManifestIO.manifestReads.get() - reads0 <= 1,
      "a key probe must resolve at most the one covering eq manifest")
    // provably-empty key predicate opens nothing
    val reads1 = ManifestIO.manifestReads.get()
    assert(meta.eqDeleteFilesMatching(sn, Seq(ce.LessThan(kAttr, ce.Literal(-1L)))).isEmpty)
    assert(ManifestIO.manifestReads.get() == reads1)
  }

  test("parallel manifest reads: cold readAll is content- and order-identical to serial") {
    // 300 manifests > the 256-entry LRU, so the first readAll sweep does
    // REAL concurrent IO for evicted documents, not just cache hits
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("graft-par").toString
    val ms = (0 until 300).map { i =>
      ManifestIO.write(dir, 1L, (0 until 20).map(j =>
        DataFileMeta(s"$dir/f$i-$j.parquet", 10L, 100L,
          Map("k" -> (i * 100 + j).toString), Map("k" -> (i * 100 + j).toString))),
        conf)
    }
    val par = ManifestIO.readAll(ms.map(_.location), conf)
    val serial = ms.flatMap(m => ManifestIO.read(m.location, conf))
    assert(par == serial, "parallel planning reads must be byte-order-identical")
    assert(par.size == 300 * 20)
  }

  test("reserved tombstone stat keys never reach a delete manifest's summary " +
      "(columns physically named file_path/pos can't trigger unsound skips)") {
    // A table column physically named `file_path` (string) or `pos`
    // (numeric) puts those keys in physicalStatKinds; tombstone ENTRIES
    // carry their TARGET path/position stats under exactly those keys, so
    // folding them into the delete manifest's summary would let
    // deleteFilesMatching compare user-column predicates against
    // target-path bounds and skip a manifest whose tombstones kill
    // predicate-matching rows — silent row resurrection. The fold must
    // strip the reserved keys for every non-data manifest.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.scale")
    spark.sql("DROP TABLE IF EXISTS lake.scale.resv")
    spark.sql("CREATE TABLE lake.scale.resv (file_path STRING, pos BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read', " +
      "'commit.manifest-merge.enabled'='false')")
    // user values lexically FAR above real target paths ('/root/...'),
    // positions far above real tombstone positions (0..99)
    spark.sql("INSERT INTO lake.scale.resv " +
      "SELECT concat('zzz-', lpad(cast(id AS string), 3, '0')), id + 1000000, id " +
      "FROM range(0, 100)")
    spark.sql("DELETE FROM lake.scale.resv WHERE v < 50")
    // the delete manifest's summary must NOT carry file_path/pos bounds
    val dels = spark.sql("SELECT summary_mins, summary_maxs FROM " +
      "lake.scale.`resv$manifests` WHERE content = 'deletes'").collect()
    assert(dels.nonEmpty)
    dels.foreach { r =>
      val mins = r.getAs[Map[String, String]]("summary_mins")
      assert(!mins.contains("file_path") && !mins.contains("pos"),
        s"reserved tombstone stat keys leaked into a delete summary: $mins")
    }
    // predicates on the colliding columns: tombstones must still APPLY
    // (with the bug, the summary's file_path bounds are target paths, the
    // 'zzz' predicate prunes the manifest, and deleted rows resurrect)
    assert(spark.sql(
      "SELECT count(*) FROM lake.scale.resv WHERE file_path >= 'zzz'")
      .head().getLong(0) == 50)
    assert(spark.sql(
      "SELECT count(*) FROM lake.scale.resv WHERE pos >= 1000000")
      .head().getLong(0) == 50)
    assert(spark.table("lake.scale.resv").count() == 50)
    spark.sql("DROP TABLE lake.scale.resv")
  }

  test("targetBoundsStamper: ANY unresolved target => deletes stay unstamped") {
    // Bounds folded over a PARTIAL target set under-cover the tombstones'
    // kill range (a scan could skip a manifest whose tombstones kill rows
    // in the unresolved target). Unreachable from today's callers, but the
    // stamper must fail safe for any future cross-snapshot caller.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.scale")
    spark.sql("DROP TABLE IF EXISTS lake.scale.stamp")
    spark.sql("CREATE TABLE lake.scale.stamp (p BIGINT, k BIGINT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO lake.scale.stamp SELECT id % 2 + 1, id FROM range(0, 20)")
    val cat = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[LakeCatalog]
    val meta = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("scale"), "stamp"))
      .asInstanceOf[LakeTable].meta
    val target = meta.currentFiles.head.path
    val del = Seq(DataFileMeta(s"${meta.location}/data/tomb.parquet", 5L, 100L,
      minValues = Map(DeleteFiles.FilePathCol -> target),
      maxValues = Map(DeleteFiles.FilePathCol -> target)))
    // fully resolved: stamped with the target's partition bounds
    val stamped = TableMeta.withTargetPartitionBounds(del, Set(target), meta)
    assert(stamped.head.minValues.contains("p") && stamped.head.maxValues.contains("p"),
      s"resolved targets must stamp partition bounds: ${stamped.head.minValues}")
    // one unresolved target: NOTHING stamped (conservative), not a fold
    // over the partial remainder
    val partial = TableMeta.withTargetPartitionBounds(
      del, Set(target, s"${meta.location}/data/not-in-this-snapshot.parquet"), meta)
    assert(partial == del,
      s"partial target resolution must leave deletes unstamped: ${partial.head.minValues}")
    spark.sql("DROP TABLE lake.scale.stamp")
  }

  test("readAll: a failed manifest read propagates; a hung read hits the planning deadline") {
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("graft-radl").toString
    val ok = (0 until 3).map(i => ManifestIO.write(dir, 1L,
      Seq(DataFileMeta(s"$dir/f$i.parquet", 1L, 10L)), conf))
    // failure propagation through the parallel path (>= 2 locations)
    intercept[java.io.FileNotFoundException] {
      ManifestIO.readAll(ok.map(_.location) :+ s"$dir/never-written.json", conf)
    }
    // a hung metadata-store GET must raise the bounded planning deadline,
    // not wedge the driver forever (SlowFs sleeps far past the 1s budget)
    conf.set("fs.graftslow.impl", classOf[SlowTestFs].getName)
    System.setProperty("graft.planning.read-timeout-sec", "1")
    try {
      val t0 = System.nanoTime()
      intercept[java.util.concurrent.TimeoutException] {
        ManifestIO.readAll(
          Seq("graftslow:/a.json", "graftslow:/b.json"), conf)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec < 5.0, s"deadline must bound the wait (took ${sec}s)")
    } finally System.clearProperty("graft.planning.read-timeout-sec")
  }

  test("manifest cache bounds KEY COUNT too: many tiny manifests cannot grow it unboundedly") {
    // the entry bound alone doesn't bound the cache when manifests are
    // near-empty (delete-churn tables): 1-entry manifests sum far below
    // the entry bound while key strings accumulate without limit
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("graft-keycap").toString
    System.setProperty("graft.manifest-cache.max-manifests", "32")
    try {
      val ms = (0 until 100).map(i => ManifestIO.write(dir, 1L,
        Seq(DataFileMeta(s"$dir/f$i.parquet", 1L, 10L)), conf))
      // every manifest still reads back correctly through the capped cache
      val all = ms.flatMap(m => ManifestIO.read(m.location, conf))
      assert(all.size == 100)
      assert(ManifestIO.cachedManifestCount <= 33, // cap + the just-put key
        s"key count must stay bounded, saw ${ManifestIO.cachedManifestCount}")
    } finally System.clearProperty("graft.manifest-cache.max-manifests")
  }

  test("800k-entry filterless plan: slim entries, entry-bounded cache, metadata-only count") {
    // The last O(table) driver cost: a FILTERLESS scan of an ~1M-file
    // table used to materialize every full-width DataFileMeta on the
    // driver. Past read.plan.slim-threshold entries the plan now holds
    // SLIM entries (planning stat keys + predicate columns only),
    // resolved manifest-by-manifest through a bounded read window, and
    // the manifest cache is bounded by TOTAL ENTRIES, not manifest count.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.scale")
    spark.sql("DROP TABLE IF EXISTS lake.scale.huge")
    spark.sql("CREATE TABLE lake.scale.huge (p BIGINT, k BIGINT, w1 STRING, w2 STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('commit.manifest-merge.enabled'='false')")
    val cat = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[LakeCatalog]
    def load() = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("scale"), "huge"))
      .asInstanceOf[LakeTable]
    val conf = spark.sessionState.newHadoopConf()
    val loc = load().meta.location
    val manifests = 200
    val perManifest = 4000
    val wide = "x" * 16
    ManifestIO.cachedEntriesHighWater.set(0)
    val t0 = System.nanoTime()
    (0 until manifests).foreach { m =>
      val tb = load()
      val files = (0 until perManifest).map { j =>
        val i = m * perManifest + j
        DataFileMeta(s"$loc/data/h-$m-$j.parquet", 1000L, 128L * 1024 * 1024,
          minValues = Map("p" -> m.toString, "k" -> (i.toLong * 1000).toString,
            "w1" -> wide, "w2" -> wide),
          maxValues = Map("p" -> m.toString, "k" -> (i.toLong * 1000 + 999).toString,
            "w1" -> (wide + "z"), "w2" -> (wide + "z")),
          nullCounts = Map("p" -> 0L, "k" -> 0L, "w1" -> 0L, "w2" -> 0L))
      }
      new LakeBatchWrite(tb, tb.meta.schema, false, cat.pointerStore, conf)
        .commit(Array(LakeCommitMessage(files)))
    }
    val commitS = (System.nanoTime() - t0) / 1e9
    val n = manifests.toLong * perManifest

    // the slim resolution itself: all entries, stat maps cut to the
    // planning keys (partition source only here — no sort order, no eq keys)
    val meta = load().meta
    val sn = meta.snapshot(meta.currentSnapshotId).get
    val t1 = System.nanoTime()
    val slim = meta.filesOfSlim(sn)
    val slimS = (System.nanoTime() - t1) / 1e9
    assert(slim.size == n)
    assert(slim.forall(f => f.minValues.keySet == Set("p") &&
      f.maxValues.keySet == Set("p") && f.nullCounts.keySet == Set("p")),
      s"slim entries must keep only planning keys: ${slim.head.minValues.keySet}")
    // full-width residency: the entry-bounded cache held, through 200
    // manifest writes AND the 200-manifest planning sweep
    val hw = ManifestIO.cachedEntriesHighWater.get()
    assert(hw <= 131072L, s"manifest cache exceeded its entry bound: $hw")

    // the slim path engages through SQL too: count(*) answers from
    // manifest row counts alone (zero data files exist, zero are read)
    assert(spark.sql("SELECT count(*) FROM lake.scale.huge").head().getLong(0) ==
      n * 1000L)
    // ...and GROUP BY the partition column still pushes (p is a planning
    // key, single-valued per file)
    assert(spark.sql("SELECT count(*) FROM lake.scale.huge GROUP BY p")
      .collect().length == manifests)

    // filtered slim resolution keeps the PREDICATE column's stats, so
    // file pruning still narrows inside the matching manifest
    import org.apache.spark.sql.catalyst.{expressions => ce}
    val kAttr = ce.AttributeReference("k", org.apache.spark.sql.types.LongType)()
    val reads0 = ManifestIO.manifestReads.get()
    val hit = meta.filesMatching(sn, Seq(ce.EqualTo(kAttr, ce.Literal(42000L))), slim = true)
    assert(ManifestIO.manifestReads.get() - reads0 <= 1,
      "a point probe must open at most the one covering manifest")
    assert(hit.forall(_.minValues.keySet == Set("p", "k")),
      s"slim+predicate entries keep p and k: ${hit.headOption.map(_.minValues.keySet)}")
    assert(hit.exists(f => f.minValues("k") == "42000"))

    println(f"[planning-scale] slim n=$n commit=$commitS%.1f s slim-plan=$slimS%.2f s " +
      f"cache-high-water=$hw entries")
    assert(slimS < 60, f"slim planning sweep took $slimS%.1f s")
    spark.sql("DROP TABLE lake.scale.huge")
  }

  test("60k deletion-vector entries over 100k files: planning stays hash-indexed, not O(n²)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.scale")
    spark.sql("DROP TABLE IF EXISTS lake.scale.dvbig")
    spark.sql("CREATE TABLE lake.scale.dvbig (k BIGINT, v STRING)")
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[LakeCatalog]
    val table = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("scale"), "dvbig"))
      .asInstanceOf[LakeTable]
    val conf = spark.sessionState.newHadoopConf()
    val n = 100000
    val files = (0 until n).map { i =>
      DataFileMeta(s"${table.meta.location}/data/s-$i.parquet", 1000L, 128L * 1024 * 1024,
        minValues = Map("k" -> (i.toLong * 1000).toString),
        maxValues = Map("k" -> (i.toLong * 1000 + 999).toString),
        nullCounts = Map("k" -> 0L))
    }
    new LakeBatchWrite(table, table.meta.schema, false, cat.pointerStore, conf)
      .commit(Array(LakeCommitMessage(files)))
    // one DV entry per tombstoned file — 60% of the table point-deleted,
    // the per-TARGET entry shape a DV-heavy table carries (metadata only;
    // a pruned-to-nothing plan never opens the containers)
    val t2 = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("scale"), "dvbig"))
      .asInstanceOf[LakeTable]
    val dvTargets = files.indices.filter(_ % 5 < 3).map(i => files(i).path)
    val dvEntries = dvTargets.zipWithIndex.map { case (p, i) =>
      DataFileMeta(s"${table.meta.location}/deletes/synth.dv", 10L, 64L,
        minValues = Map(DeleteFiles.FilePathCol -> p),
        maxValues = Map(DeleteFiles.FilePathCol -> p),
        dvOffset = i.toLong * 64, dvLength = 64L)
    }
    new LakeDeltaBatchWrite(t2,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE,
      t2.meta.schema, cat.pointerStore, conf)
      .commit(Array(LakeDeltaCommitMessage(Nil, dvEntries, dvTargets)))

    val t0 = System.nanoTime()
    assert(spark.sql("SELECT * FROM lake.scale.dvbig WHERE k < 0").collect().isEmpty)
    val missS = (System.nanoTime() - t0) / 1e9
    // O(files × entries) would be 6e9 range checks (minutes); hash-indexed
    // covering resolution keeps the whole pass in seconds
    assert(missS < 30, f"DV-heavy planning took $missS%.1f s")
    // scan statistics subtract the DV cardinalities (exact per target) —
    // on a handle resolved AFTER the delta commit
    val t3 = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("scale"), "dvbig"))
      .asInstanceOf[LakeTable]
    val scan = t3.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of())).build()
    val est = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().numRows().getAsLong
    assert(est == n.toLong * 1000 - dvEntries.size * 10L, s"got $est")
    println(f"[planning-scale] dv entries=${dvEntries.size} miss-plan=$missS%.2f s")
    spark.sql("DROP TABLE lake.scale.dvbig")
  }
}
