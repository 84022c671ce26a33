package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Stream offset = committed snapshot id (0 = nothing consumed). */
final case class LakeOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}

/** Incremental read of a lake table as a micro-batch stream
  * (`spark.readStream.table("lake.ns.t")`): each trigger consumes the data
  * files added between the last committed snapshot and the current pointer
  * — the metadata IS the changelog, so there is no directory polling and no
  * file-listing anywhere, and a batch is exactly "what the CAS committed
  * since last time". First batch replays the table from the beginning
  * (snapshot 0 → current), matching file-source semantics.
  *
  * Restriction: append-only consumption. Snapshots produced by overwrite /
  * replace-rows / delete rewrite history rather than appending; a stream
  * positioned before one fails fast rather than emitting wrong deltas.
  */
final class LakeMicroBatchStream(
    ident: String,
    tableSchema: StructType,
    refresh: () => TableMeta,
    options: CaseInsensitiveStringMap,
    hadoopConf: Configuration)
  extends MicroBatchStream {

  /** Where a NEW stream (no checkpoint) starts: snapshot 0 = replay the
    * whole table (file-source semantics); "latest" = only data committed
    * after the stream starts; an explicit snapshot id = resume point
    * (consume strictly after it).
    */
  override def initialOffset(): Offset =
    Option(options.get("starting-snapshot-id")) match {
      case Some("latest") => LakeOffset(math.max(refresh().currentSnapshotId, 0L))
      case Some(id) =>
        val n = id.toLong
        require(n >= 0, s"starting-snapshot-id must be >= 0 or 'latest', got $id")
        LakeOffset(n)
      case None => LakeOffset(0L)
    }

  override def latestOffset(): Offset = {
    val id = refresh().currentSnapshotId
    LakeOffset(math.max(id, 0L))
  }

  override def deserializeOffset(json: String): Offset = LakeOffset(json.toLong)

  private def filesAsOf(meta: TableMeta, snapshotId: Long): Seq[DataFileMeta] =
    if (snapshotId <= 0) Nil
    else meta.snapshot(snapshotId).map(meta.filesOf).getOrElse(
      throw new IllegalStateException(
        s"stream over $ident: snapshot $snapshotId no longer exists"))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LakeOffset].snapshotId
    val e = end.asInstanceOf[LakeOffset].snapshotId
    if (e <= s) return Array.empty
    val meta = refresh()
    // fail fast if any consumed snapshot is not an append (delta would lie)
    meta.snapshots.filter(x => x.snapshotId > s && x.snapshotId <= e).foreach { snap =>
      // stage-append/publish (WAP) deltas are append-only: offsets are
      // pointer positions, and the set-difference below counts staged
      // files exactly once — when a publish brings them into the lineage
      // rewrite-manifests changes no file: the path set-difference below
      // sees straight through it
      if (!Set("append", "stream-append", "create", "stage-append", "publish",
        "rewrite-manifests")(snap.operation))
        throw new IllegalStateException(
          s"stream over $ident: snapshot ${snap.snapshotId} is '${snap.operation}' — " +
            "incremental reads support append-only history")
    }
    val before = filesAsOf(meta, s).map(_.path).toSet
    val delta = filesAsOf(meta, e).filterNot(f => before.contains(f.path))
    if (delta.isEmpty) return Array.empty
    innerBatch(delta).planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the parquet reader factory is file-independent (schema + conf); build
    // it over the current manifest
    innerBatch(refresh().currentFiles).createReaderFactory()

  private def innerBatch(files: Seq[DataFileMeta]) = {
    val spark = SparkSession.active
    val pt = ParquetTable(ident, spark, options, files.map(_.path).toList,
      Some(tableSchema), classOf[ParquetFileFormat])
    pt.newScanBuilder(options).build().toBatch
  }

  override def commit(end: Offset): Unit = () // progress lives in the checkpoint

  override def stop(): Unit = ()
}
