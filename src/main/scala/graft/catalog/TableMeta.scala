package graft.catalog

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, StructType}

/** One data file tracked by a snapshot. Column min/max (stringified) enable
  * metadata-level file pruning without opening parquet footers — at 100 TB
  * the difference between "plan touches 40 files" and "plan opens 400k
  * footers". Mirrors what the Iceberg spec keeps per manifest entry; the
  * reference stores this opaquely inside its metadata JSON
  * (reference: src/catalog/mod.rs:217-220).
  */
final case class DataFileMeta(
    path: String,
    rowCount: Long,
    sizeBytes: Long,
    minValues: Map[String, String] = Map.empty,
    maxValues: Map[String, String] = Map.empty)

/** A committed table version: full file list as of this snapshot (inline
  * manifest — at extreme file counts this would page out to manifest files,
  * same as Iceberg's manifest-list indirection; the pointer-swap protocol is
  * unchanged by that).
  */
final case class SnapshotMeta(
    snapshotId: Long,
    timestampMs: Long,
    operation: String, // "append" | "overwrite" | "create"
    manifest: Seq[DataFileMeta])

/** The table-metadata document our catalog stores in the warehouse — the
  * analog of the Iceberg TableMetadata JSON the reference deserializes
  * (reference: src/catalog/mod.rs:217-228). The current-version POINTER
  * lives in the JDBC store; this document is immutable once written, and
  * every commit writes a new one then CAS-swaps the pointer.
  */
final case class TableMeta(
    formatVersion: Int,
    location: String,
    schemaJson: String,
    partitionColumns: Seq[String],
    properties: Map[String, String],
    currentSnapshotId: Long, // -1 = empty table, no snapshot yet
    snapshots: Seq[SnapshotMeta]) {

  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]

  def snapshot(id: Long): Option[SnapshotMeta] = snapshots.find(_.snapshotId == id)

  def currentFiles: Seq[DataFileMeta] =
    snapshot(currentSnapshotId).map(_.manifest).getOrElse(Nil)

  def nextSnapshotId: Long = if (snapshots.isEmpty) 1L else snapshots.map(_.snapshotId).max + 1
}

/** Shared CAS-retry policy: commits that lose the pointer race refresh and
  * retry up to [[maxAttempts]] times with linear backoff + per-thread
  * jitter — without the backoff, N writers hammering the same row
  * livelock each other into spurious commit failures (the reference has
  * no retry at all, SURVEY §2a gap).
  */
object CasRetry {
  val maxAttempts = 20
  def backoff(attempt: Int): Unit =
    Thread.sleep(5L * attempt + (Thread.currentThread().getId % 11))
}

/** Two concurrent commits rewrote the same data file (DELETE ∥ compact,
  * UPDATE ∥ UPDATE, …). Blindly rebasing would re-add rows the winner
  * removed, so the loser must fail: rewrites are serializable-or-fail,
  * only pure appends rebase automatically (Iceberg's validation model).
  */
final class CommitConflictException(msg: String) extends IllegalStateException(msg)

object CasCommit {
  /** Iceberg-style rebase precondition for file-replacing commits: every
    * file this commit replaces must still be live in the (possibly
    * concurrently-advanced) base snapshot. Appends pass trivially
    * (`replaced` empty).
    */
  def requireReplacedLive(
      base: TableMeta, replacedPaths: Set[String], operation: String, ident: String): Unit = {
    if (replacedPaths.nonEmpty) {
      val live = base.currentFiles.map(_.path).toSet
      val gone = replacedPaths -- live
      if (gone.nonEmpty)
        throw new CommitConflictException(
          s"$operation on $ident: ${gone.size} file(s) this commit rewrites were " +
            s"concurrently removed or rewritten (e.g. ${gone.head}); " +
            "rewrites are serializable-or-fail — retry the whole operation")
    }
  }
}

object TableMeta {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def empty(location: String, schema: StructType, partitionColumns: Seq[String],
      properties: Map[String, String]): TableMeta =
    TableMeta(1, location, schema.json, partitionColumns, properties, -1L, Nil)

  def toJson(m: TableMeta): String = mapper.writeValueAsString(m)
  def fromJson(s: String): TableMeta = mapper.readValue(s, classOf[TableMeta])

  /** Read a metadata document from the warehouse (Hadoop FS: local in tests,
    * S3A/HDFS in prod — same code path as the reference's object_store.get,
    * reference: src/catalog/mod.rs:209-216).
    */
  def read(metadataLocation: String, conf: Configuration): TableMeta = {
    val p = new Path(metadataLocation)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try fromJson(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Write a new immutable metadata document; returns its location. Name
    * carries a UUID so two racing committers never collide on the file even
    * before the CAS decides the winner.
    */
  def write(meta: TableMeta, conf: Configuration): String = {
    val loc = s"${meta.location}/metadata/v${meta.currentSnapshotId}-${java.util.UUID.randomUUID()}.metadata.json"
    val p = new Path(loc)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, false)
    try out.write(toJson(meta).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    loc
  }
}
