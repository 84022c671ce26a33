package graft.catalog

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.util.SerializableConfiguration
import org.roaringbitmap.longlong.Roaring64Bitmap

/** DELETION VECTORS — Iceberg v3's positional-delete representation,
  * selected per table with `write.delete.format = 'dv'` (default stays
  * `'parquet'`, the v2 (file_path, pos) tombstone files).
  *
  * One CONTAINER file (`deletes/dv-*.dv`) per writer task / maintenance
  * partition holds a roaring bitmap per tombstoned target file,
  * back-to-back; the table metadata carries one [[DataFileMeta]] entry per
  * target — `(container path, dvOffset, dvLength)` slice plus the exact
  * target in min/max — so ALL planning questions (which deletes cover this
  * file, how many rows died, which delete entries fold away after a
  * rewrite) answer from metadata alone, no file opens. At 100 TB this is
  * the point: a parquet tombstone list costs a filtered columnar read per
  * dirty file per scan and its per-target coverage is only a file_path
  * RANGE, while a DV is one seek + a compact bitmap with EXACT per-target
  * coverage and O(1) membership. The reference's catalog is
  * representation-agnostic (metadata is an opaque pointer swap, reference:
  * src/catalog/mod.rs:296-347), so both shapes ride the same CAS commit.
  *
  * Bitmaps serialize with Roaring64Bitmap's own framing; containers are
  * immutable once committed (same lifecycle as every other file here).
  */
object DeletionVectors {
  val Suffix = ".dv"

  /** Does this table write deletion vectors? (`write.delete.format`) */
  def enabled(properties: Map[String, String]): Boolean =
    properties.get("write.delete.format").contains("dv")

  /** Read ONE target's bitmap out of a container. */
  def readBitmap(path: String, offset: Long, length: Long,
      conf: Configuration): Roaring64Bitmap = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      in.seek(offset)
      val bytes = new Array[Byte](length.toInt)
      in.readFully(bytes)
      val bm = new Roaring64Bitmap()
      bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
      bm
    } finally in.close()
  }

  /** Ascending positions of `bm` within `[lo, hi)`: seeks straight to
    * `lo` and stops at `hi`, so each split task pays O(its own
    * tombstones), not O(the file's total cardinality) — K split tasks
    * over one heavily-deleted file must not multiply tombstone CPU by K.
    */
  def positionsInRange(bm: Roaring64Bitmap, lo: Long, hi: Long): Array[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val it = bm.getLongIteratorFrom(lo)
    var done = false
    while (!done && it.hasNext) {
      val v = it.next()
      if (v >= hi) done = true
      else if (v >= lo) buf += v // iterator-from may round down a bucket
    }
    buf.toArray
  }

  /** `(file_path, pos)` rows of MIXED parquet/DV delete entries as a
    * DataFrame — the one loader every driver-side consumer (CoW rewrites,
    * changelog, delete-file consolidation) goes through, so adding the DV
    * shape changed no consumer logic. DV containers load executor-side,
    * one task per slice batch.
    */
  def tombstonesDf(spark: SparkSession, entries: Seq[DataFileMeta],
      conf: Configuration): DataFrame = {
    val (dv, pq) = entries.partition(_.isDv)
    val dfs = Seq.newBuilder[DataFrame]
    if (pq.nonEmpty)
      dfs += spark.read.schema(DeleteFiles.schema).parquet(pq.map(_.path).distinct: _*)
    if (dv.nonEmpty) {
      val sconf = new SerializableConfiguration(conf)
      val refs = dv.map(d => (d.path, d.dvOffset, d.dvLength,
        d.minValues(DeleteFiles.FilePathCol)))
      val rows = spark.sparkContext
        .parallelize(refs, math.max(1, math.min(refs.size, 64)))
        .flatMap { case (p, off, len, target) =>
          val bm = readBitmap(p, off, len, sconf.value)
          val it = bm.getLongIterator
          new Iterator[Row] {
            override def hasNext: Boolean = it.hasNext
            override def next(): Row = Row(target, it.next())
          }
        }
      dfs += spark.createDataFrame(rows, DeleteFiles.schema)
    }
    val all = dfs.result()
    if (all.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DeleteFiles.schema)
    else all.reduce(_ unionByName _)
  }
}

/** Accumulates per-target bitmaps (in any arrival order — targets may be
  * revisited, e.g. an UPDATE whose required ordering puts partition
  * columns before `_file`) and writes them back-to-back into ONE
  * immutable container file at commit. Memory is a compressed bitmap per
  * distinct target this writer touched.
  */
final class DvContainerWriter(dir: String, nameHint: String, conf: Configuration) {
  private val path = s"$dir/dv-$nameHint-${java.util.UUID.randomUUID()}${DeletionVectors.Suffix}"
  private val p = new Path(path)
  private val fs = p.getFileSystem(conf)
  private val bitmaps = new java.util.LinkedHashMap[String, Roaring64Bitmap]()

  /** Tombstone `pos` of `target`. */
  def record(target: String, pos: Long): Unit =
    bitmaps.computeIfAbsent(target, _ => new Roaring64Bitmap()).addLong(pos)

  /** Merge a whole bitmap for `target` (unions with anything recorded). */
  def add(target: String, bm: Roaring64Bitmap): Unit =
    bitmaps.merge(target, bm, (a, b) => { a.or(b); a })

  /** Write the container, return one metadata entry per distinct target
    * (exactly one — revisits were unioned; empty if nothing recorded).
    */
  def commit(): Seq[DataFileMeta] = {
    if (bitmaps.isEmpty) return Nil
    val out = new DataOutputStream(fs.create(p, false))
    val entries = Seq.newBuilder[DataFileMeta]
    var offset = 0L
    try {
      bitmaps.forEach { (target, bm) =>
        bm.runOptimize()
        val len = bm.serializedSizeInBytes()
        bm.serialize(out)
        entries += DataFileMeta(path, bm.getLongCardinality, len,
          minValues = Map(DeleteFiles.FilePathCol -> target),
          maxValues = Map(DeleteFiles.FilePathCol -> target),
          dvOffset = offset, dvLength = len)
        offset += len
      }
    } finally out.close()
    entries.result()
  }

  def abort(): Unit = if (fs.exists(p)) fs.delete(p, false)
}
