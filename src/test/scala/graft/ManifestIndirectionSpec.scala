package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB metadata-growth property: with manifest-list indirection a
  * commit writes O(new files) bytes and the metadata document stays
  * O(snapshots) — never O(total files x snapshots) as the old inline
  * manifests did. Pure TableMeta-level tests (no Spark session).
  */
class ManifestIndirectionSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private val schema = StructType(Seq(StructField("k", LongType)))

  private def tmp(tag: String): String =
    "file:" + java.nio.file.Files.createTempDirectory(s"manif_$tag").toString

  private def fakeFiles(snap: Int, n: Int, dir: String): Seq[DataFileMeta] =
    (1 to n).map(i => DataFileMeta(s"$dir/data/f-$snap-$i.parquet", 100L, 4096L,
      Map("k" -> (i * 10).toString), Map("k" -> (i * 10 + 9).toString)))

  test("50 snapshots x 1k files: metadata doc stays O(KB) with zero inline paths") {
    val dir = tmp("stress")
    var meta = TableMeta.empty(dir, schema, Nil, Map.empty)
    meta.ioConf = conf
    for (s <- 1 to 50)
      meta = TableMeta.withAppend(meta, "append", fakeFiles(s, 20, dir), conf)
    assert(meta.snapshots.size == 50)
    assert(meta.currentFiles.size == 1000)
    val json = TableMeta.toJson(meta)
    assert(json.length < 20 * 1024,
      s"metadata document must stay O(snapshots): ${json.length} bytes for 1000 files")
    assert(!json.contains(".parquet"),
      "no data-file path may appear inline in the metadata document")
    // disk round-trip: lazily-loaded manifests reproduce the exact file set
    val loc = TableMeta.write(meta, conf)
    val back = TableMeta.read(loc, conf)
    assert(back.currentFiles.map(_.path).sorted == meta.currentFiles.map(_.path).sorted)
    // summaries answer without opening manifests
    assert(back.snapshots.last.nFiles == 1000 && back.snapshots.last.nRows == 100000L)
    assert(back.snapshots.head.nFiles == 20)
  }

  test("append commits share previous manifests by reference (one new manifest per commit)") {
    val dir = tmp("share")
    var meta = TableMeta.empty(dir, schema, Nil, Map.empty)
    meta.ioConf = conf
    meta = TableMeta.withAppend(meta, "append", fakeFiles(1, 5, dir), conf)
    meta = TableMeta.withAppend(meta, "append", fakeFiles(2, 5, dir), conf)
    meta = TableMeta.withAppend(meta, "append", fakeFiles(3, 5, dir), conf)
    val m1 = meta.manifestsOf(meta.snapshot(1L).get).map(_.location)
    val m2 = meta.manifestsOf(meta.snapshot(2L).get).map(_.location)
    val m3 = meta.manifestsOf(meta.snapshot(3L).get).map(_.location)
    assert(m1.size == 1 && m2.size == 2 && m3.size == 3)
    assert(m2.take(1) == m1, "snapshot 2 must reference snapshot 1's manifest verbatim")
    assert(m3.take(2) == m2, "snapshot 3 must reference snapshot 2's manifests verbatim")
  }

  test("rewrite touches only manifests containing replaced files") {
    val dir = tmp("rw")
    var meta = TableMeta.empty(dir, schema, Nil, Map.empty)
    meta.ioConf = conf
    val a = fakeFiles(1, 4, dir); val b = fakeFiles(2, 4, dir); val c = fakeFiles(3, 4, dir)
    meta = TableMeta.withAppend(meta, "append", a, conf)
    meta = TableMeta.withAppend(meta, "append", b, conf)
    meta = TableMeta.withAppend(meta, "append", c, conf)
    val before = meta.manifestsOf(meta.snapshot(3L).get).map(_.location)
    // replace one file from manifest B with a rewritten file
    val rewritten = Seq(DataFileMeta(s"$dir/data/rw.parquet", 50L, 2048L,
      Map("k" -> "0"), Map("k" -> "9")))
    meta = TableMeta.withRewrite(meta, "delete", Set(b.head.path), rewritten, conf)
    val after = meta.manifestsOf(meta.snapshot(4L).get).map(_.location)
    // manifests A and C carried by reference; B rewritten; one new manifest
    assert(after.contains(before(0)), "untouched manifest A must be shared by reference")
    assert(after.contains(before(2)), "untouched manifest C must be shared by reference")
    assert(!after.contains(before(1)), "manifest B contained a replaced file: must be rewritten")
    assert(after.size == 4)
    val files = meta.currentFiles.map(_.path).toSet
    assert(!files.contains(b.head.path) && files.contains(rewritten.head.path))
    assert(files.size == 12, s"4 + (4-1) + 4 + 1 rewritten = 12, got ${files.size}")
  }

  test("legacy inline snapshots read correctly and page out on the next commit") {
    val dir = tmp("legacy")
    val inline = fakeFiles(1, 3, dir)
    var meta = TableMeta.empty(dir, schema, Nil, Map.empty)
      .copy(currentSnapshotId = 1L,
        snapshots = Seq(SnapshotMeta(1L, 12345L, "append", inline)))
    meta.ioConf = conf
    assert(meta.currentFiles.map(_.path) == inline.map(_.path))
    assert(meta.snapshots.head.nFiles == 3)
    meta = TableMeta.withAppend(meta, "append", fakeFiles(2, 2, dir), conf)
    assert(meta.currentFiles.size == 5)
    assert(meta.snapshots.last.inlineFiles.isEmpty, "new snapshots never inline files")
  }
}
