package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStreaming

/** M7: Structured Streaming over events — watermarked tumbling windows,
  * stateful dedup, session windows, and the exactly-once lake sink (every
  * micro-batch commits through the CAS pointer swap with an epoch guard).
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  // (event_id, ts, user_id, event_type, value)
  private type Ev = (Long, Timestamp, Long, String, Double)

  private def toDf(s: org.apache.spark.sql.DataFrame) =
    s.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("streaming transitions: cross-batch boundary pair stitched from carried state") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = EventsStreaming.transitions(toDf(input.toDF()))
      .writeStream.format("memory").queryName("trans").outputMode("append")
      .start()
    // batch 1: u1 view@1 then click@2 (emits view→click, state holds
    // click); u2 view@4 (no pair yet, state holds view)
    input.addData(
      (1L, ts(1), 1L, "view", 0.0), (2L, ts(2), 1L, "click", 0.0),
      (3L, ts(4), 2L, "view", 0.0))
    q.processAllAvailable()
    // batch 2: u1 purchase@3 — the click→purchase pair crosses the batch
    // boundary and must come from the carried state; u2 error@5
    input.addData(
      (4L, ts(3), 1L, "purchase", 0.0), (5L, ts(5), 2L, "error", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans")
      .collect().map(r => (r.getString(0), r.getString(1))).toList.sorted
    assert(got == List(("click", "purchase"), ("view", "click"), ("view", "error")),
      s"got $got")
  }

  test("streaming funnel state machine: strict order across batches, late events ignored") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = EventsStreaming.funnelStages(toDf(input.toDF()))
      .writeStream.format("memory").queryName("funnel").outputMode("append")
      .start()
    // batch 1: u1 view@1 then click@2 (advances twice); u2 click@1 (no
    // view yet — ignored); u3 view@10
    input.addData(
      (1L, ts(1), 1L, "view", 0.0), (2L, ts(2), 1L, "click", 0.0),
      (3L, ts(1), 2L, "click", 0.0), (4L, ts(10), 3L, "view", 0.0))
    q.processAllAvailable()
    // batch 2: u1 purchase@3 completes; u2's batch arrives OUT OF ORDER
    // (click@3 before view@2 in arrival, sorted by event time inside the
    // batch → view@2 advances, click@3 advances); u3 click@5 is LATE
    // (before its view@10) — must not advance
    input.addData(
      (5L, ts(3), 1L, "purchase", 0.0),
      (6L, ts(3), 2L, "click", 0.0), (7L, ts(2), 2L, "view", 0.0),
      (8L, ts(5), 3L, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
    val want = Set(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "view", ts(2)), (2L, "click", ts(3)),
      (3L, "view", ts(10)))
    assert(got == want, s"got $got")
  }

  test("tumbling windows with watermark: windows finalize exactly once, late data within watermark counted") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = EventsStreaming.tumblingCounts(toDf(input.toDF()), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("tumbling").outputMode("append")
      .start()
    // hour-0 events, then a batch far enough ahead to close hour 0
    input.addData((1L, ts(5), 1L, "click", 1.0), (2L, ts(50), 1L, "click", 2.0))
    q.processAllAvailable()
    input.addData((3L, ts(55), 2L, "view", 5.0)) // late but inside watermark
    input.addData((4L, ts(200), 1L, "click", 1.0)) // advances watermark past hour 0+30m
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tumbling").orderBy("window_start", "event_type").collect()
    // hour 0 finalized: click n=2 sum=3.0, view n=1 sum=5.0; hour 3 not emitted yet
    assert(out.length == 2)
    assert(out(0).getAs[String]("event_type") == "click" && out(0).getAs[Long]("n") == 2
      && out(0).getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[String]("event_type") == "view" && out(1).getAs[Long]("n") == 1
      && out(1).getAs[Double]("sum_value") == 5.0)
  }

  test("dropDuplicatesWithinWatermark: cross-batch duplicate event_ids collapse") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = EventsStreaming.dedupped(toDf(input.toDF()), "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append")
      .start()
    input.addData((1L, ts(1), 1L, "click", 1.0), (2L, ts(2), 1L, "view", 1.0))
    q.processAllAvailable()
    input.addData((1L, ts(3), 1L, "click", 1.0)) // duplicate id inside watermark
    input.addData((3L, ts(10), 2L, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)))
  }

  test("streaming sink into lake: micro-batches append snapshots through the CAS, state visible to batch reads") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.ev_counts")
    spark.sql(
      """CREATE TABLE lake.stream.ev_counts
        |  (window_start TIMESTAMP, event_type STRING, n BIGINT, sum_value DOUBLE)""".stripMargin)
    val input = MemoryStream[Ev](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = EventsStreaming.tumblingCounts(toDf(input.toDF()), "1 hour", "30 minutes")
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .toTable("lake.stream.ev_counts")
    input.addData((1L, ts(5), 1L, "click", 1.0), (2L, ts(20), 1L, "click", 2.0))
    q.processAllAvailable()
    input.addData((3L, ts(200), 1L, "view", 1.0)) // closes hour 0
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lake.stream.ev_counts").collect()
    assert(rows.length == 1) // hour-0 click window, emitted once
    assert(rows(0).getAs[Long]("n") == 2 && rows(0).getAs[Double]("sum_value") == 3.0)
  }

  test("streaming near-dup: each micro-batch probes the persisted band index, pairs land in the lake") {
    // the TRUE-STREAMING form of q99's incremental near-dup: documents
    // arrive as micro-batches, each batch LSH-probes the band index built
    // from all PRIOR batches, verified pairs append to a lake results
    // table (never the driver), then the batch's own bands ingest. State
    // lives entirely in lake tables — a restart resumes from the index.
    import spark.implicits._
    import graft.functions.TextHashing.{minhashSignature, wordNgrams}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.nd_idx")
    spark.sql("DROP TABLE IF EXISTS lake.stream.nd_out")
    spark.sql(
      """CREATE TABLE lake.stream.nd_idx (doc_id BIGINT, band INT, bh BIGINT)
        |PARTITIONED BY (bucket(8, bh))""".stripMargin)
    spark.sql("CREATE TABLE lake.stream.nd_out (id_a BIGINT, id_b BIGINT)")
    val (bands, rpb) = (16, 4)
    def bandsOf(df: org.apache.spark.sql.DataFrame) = {
      val sh = array_distinct(wordNgrams(split(lower(col("text")), " "), 3))
      val sigs = df.select(col("doc_id"), minhashSignature(sh, bands * rpb, 42L).as("sig"))
      val bandStructs = (0 until bands).map(b =>
        struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * rpb + 1, rpb)).as("bh")))
      sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
        .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
    }
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-nd-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.cache()
        try {
          val probe = bandsOf(b).select(col("doc_id").as("id_b"), col("band"), col("bh"))
          val idx = spark.table("lake.stream.nd_idx")
            .select(col("doc_id").as("id_a"), col("band"), col("bh"))
          probe.join(idx, Seq("band", "bh"))
            .select(col("id_a"), col("id_b")).distinct()
            .writeTo("lake.stream.nd_out").append() // candidates commit first
          bandsOf(b).writeTo("lake.stream.nd_idx").append()
        } finally b.unpersist()
      }.start()
    input.addData((1L, base), (2L, "completely different words about spark shuffles and joins here"))
    q.processAllAvailable()
    // batch 2: doc 11 duplicates doc 1 (one word changed), doc 12 is fresh
    input.addData((11L, base.replace("today", "tomorrow")),
      (12L, "yet another unrelated document mentioning parquet files and manifests"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("lake.stream.nd_out")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 11L)), s"cross-batch near-dup must be found, got $pairs")
    assert(!pairs.exists { case (a, b) => a >= 11L && b >= 11L },
      s"a batch must never pair with itself (probe-before-ingest), got $pairs")
    assert(!pairs.exists { case (a, b) => b == 12L || b == 2L },
      s"unique docs must not pair, got $pairs")
  }

  test("exactly-once: replaying a committed epoch is a no-op (sink-retry contract)") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    import graft.catalog.{LakeCommitMessage, LakeTable}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.eo")
    spark.sql("CREATE TABLE lake.stream.eo (k BIGINT)")
    spark.sql("INSERT INTO lake.stream.eo VALUES (1), (2)")
    val cat = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array("stream"), "eo")

    def writeEpoch(epoch: Long): Unit = {
      val table = cat.loadTable(ident).asInstanceOf[LakeTable]
      val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def queryId(): String = "test-query"
        override def schema() = table.schema()
        override def options() =
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Collections.emptyMap())
      }
      val sw = table.newWriteBuilder(info).build().toStreaming
      val factory = sw.createStreamingWriterFactory(null)
      val w = factory.createWriter(0, 0L, epoch)
      w.write(org.apache.spark.sql.catalyst.InternalRow(99L))
      sw.commit(epoch, Array(w.commit()))
    }

    writeEpoch(7L)
    val afterFirst = spark.table("lake.stream.eo").count()
    assert(afterFirst == 3) // 2 initial + 1 streamed
    writeEpoch(7L) // replay of the SAME epoch — must be swallowed
    assert(spark.table("lake.stream.eo").count() == afterFirst)
    writeEpoch(8L) // next epoch lands normally
    assert(spark.table("lake.stream.eo").count() == afterFirst + 1)
  }

  test("incremental streaming read: each INSERT's snapshot arrives as one micro-batch delta") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.inc")
    spark.sql("CREATE TABLE lake.stream.inc (k BIGINT)")
    spark.sql("INSERT INTO lake.stream.inc VALUES (1), (2)")
    val q = spark.readStream.table("lake.stream.inc")
      .writeStream.format("memory").queryName("inc_out").outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("inc_out").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "first batch replays existing table content")
    spark.sql("INSERT INTO lake.stream.inc VALUES (3)")
    q.processAllAvailable()
    assert(spark.table("inc_out").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L),
      "subsequent snapshots arrive incrementally, no re-read of old files")
    spark.sql("INSERT INTO lake.stream.inc VALUES (4), (5)")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("inc_out").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("lake-to-lake streaming pipeline: incremental read -> transform -> exactly-once sink") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.src")
    spark.sql("DROP TABLE IF EXISTS lake.stream.dst")
    spark.sql("CREATE TABLE lake.stream.src (k BIGINT)")
    spark.sql("CREATE TABLE lake.stream.dst (k BIGINT, doubled BIGINT)")
    spark.sql("INSERT INTO lake.stream.src VALUES (1), (2)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-l2l").toString
    val q = spark.readStream.table("lake.stream.src")
      .withColumn("doubled", col("k") * 2)
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .toTable("lake.stream.dst")
    q.processAllAvailable()
    spark.sql("INSERT INTO lake.stream.src VALUES (3)")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("lake.stream.dst").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 4L), (3L, 6L)))
  }

  test("admission control: max-files-per-trigger bounds each micro-batch") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.rl")
    spark.sql("CREATE TABLE lake.stream.rl (id BIGINT)")
    spark.range(6).repartition(3).writeTo("lake.stream.rl").append() // ONE snapshot, 3 files
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.option("max-files-per-trigger", "1").table("lake.stream.rl")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        batchSizes.synchronized { if (n > 0) batchSizes += n }
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    val sizes = batchSizes.synchronized(batchSizes.toSeq)
    assert(sizes.sum == 6)
    assert(sizes == Seq(2L, 2L, 2L),
      s"one 3-file snapshot must arrive as 3 one-file batches, got $sizes")
  }

  test("admission control: max-rows-per-trigger packs whole files up to the row cap") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.rr")
    spark.sql("CREATE TABLE lake.stream.rr (id BIGINT)")
    spark.range(6).repartition(3).writeTo("lake.stream.rr").append() // 3 files x 2 rows
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.option("max-rows-per-trigger", "4").table("lake.stream.rr")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        batchSizes.synchronized { if (n > 0) batchSizes += n }
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    val sizes = batchSizes.synchronized(batchSizes.toSeq)
    assert(sizes == Seq(4L, 2L), s"expected a 2-file batch then a 1-file batch, got $sizes")
  }

  test("admission control: max-bytes-per-trigger bounds batches by manifest file sizes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.rb")
    spark.sql("CREATE TABLE lake.stream.rb (id BIGINT)")
    spark.range(6).repartition(3).writeTo("lake.stream.rb").append() // 3 files x 2 rows
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    // 1 byte < any parquet file: the at-least-one rule admits exactly one file per batch
    val q = spark.readStream.option("max-bytes-per-trigger", "1").table("lake.stream.rb")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        batchSizes.synchronized { if (n > 0) batchSizes += n }
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    val sizes = batchSizes.synchronized(batchSizes.toSeq)
    assert(sizes == Seq(2L, 2L, 2L), s"expected one-file batches under the byte cap, got $sizes")
  }

  test("Trigger.AvailableNow drains the table in rate-limited batches, then stops") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.an")
    spark.sql("CREATE TABLE lake.stream.an (id BIGINT)")
    spark.range(6).repartition(3).writeTo("lake.stream.an").append()
    val q = spark.readStream.option("max-files-per-trigger", "1").table("lake.stream.an")
      .writeStream.format("memory").queryName("an_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(spark.table("an_out").count() == 6, "every pre-existing row arrives before it stops")
  }

  test("source metrics report the outstanding backlog (files/rows/bytes)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.met")
    spark.sql("CREATE TABLE lake.stream.met (id BIGINT)")
    spark.range(6).repartition(3).writeTo("lake.stream.met").append()
    val q = spark.readStream.table("lake.stream.met")
      .writeStream.format("memory").queryName("met_out").outputMode("append").start()
    q.processAllAvailable()
    val m = q.lastProgress.sources.head.metrics
    assert(m.get("pendingFiles") == "0" && m.get("pendingRows") == "0",
      s"drained stream must report an empty backlog, got $m")
    q.stop()
  }

  test("starting-timestamp: stream begins after the last snapshot at-or-before the timestamp") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.ts")
    spark.sql("CREATE TABLE lake.stream.ts (k BIGINT)")
    spark.sql("INSERT INTO lake.stream.ts VALUES (1), (2)")
    val cutoff = {
      val t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
        .loadTable(Identifier.of(Array("stream"), "ts")).asInstanceOf[graft.catalog.LakeTable]
      t.meta.snapshots.map(_.timestampMs).max
    }
    Thread.sleep(5) // keep snapshot 3's timestamp strictly after the cutoff
    spark.sql("INSERT INTO lake.stream.ts VALUES (3)")
    val q = spark.readStream.option("starting-timestamp", cutoff.toString)
      .table("lake.stream.ts")
      .writeStream.format("memory").queryName("ts_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    import spark.implicits._
    assert(spark.table("ts_out").as[Long].collect().toSeq == Seq(3L),
      "history at-or-before the timestamp is skipped; later snapshots stream")
  }

  test("stream offsets: legacy and mid-snapshot forms; rate-limited walk is deterministic") {
    import graft.catalog.LakeOffset
    // offset wire format: legacy checkpoints ("123") keep their meaning
    assert(LakeOffset.parse("5") == LakeOffset(5) && LakeOffset(5).json == "5")
    assert(LakeOffset.parse("5:2") == LakeOffset(5, 2) && LakeOffset(5, 2).json == "5:2")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.ofs")
    spark.sql("CREATE TABLE lake.stream.ofs (id BIGINT)")
    spark.range(6).repartition(3).writeTo("lake.stream.ofs").append()
    val t = {
      import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
      spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
        .loadTable(Identifier.of(Array("stream"), "ofs")).asInstanceOf[graft.catalog.LakeTable]
    }
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("max-files-per-trigger", "1"))
    val stream = t.newScanBuilder(opts).build().toMicroBatchStream("")
    val ac = stream.asInstanceOf[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
    def filesIn(ps: Array[org.apache.spark.sql.connector.read.InputPartition]): Int =
      ps.map(_.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition].files.length).sum

    val start = stream.initialOffset().asInstanceOf[LakeOffset]
    val limit = ac.getDefaultReadLimit
    val o1 = ac.latestOffset(start, limit).asInstanceOf[LakeOffset]
    val o2 = ac.latestOffset(o1, limit).asInstanceOf[LakeOffset]
    val o3 = ac.latestOffset(o2, limit).asInstanceOf[LakeOffset]
    assert(o1.pos == 1 && o2.pos == 2, s"mid-snapshot offsets expected, got $o1 $o2")
    assert(o3.pos == -1, "the final file lands on the snapshot boundary, canonical form")
    assert(o1.snapshotId == o3.snapshotId)
    // each step plans exactly one file; a replayed larger range (restart
    // from a checkpoint) resolves the SAME files
    assert(filesIn(stream.planInputPartitions(start, o1)) == 1)
    assert(filesIn(stream.planInputPartitions(o1, o3)) == 2)
    assert(filesIn(stream.planInputPartitions(start, o3)) == 3)
    assert(stream.planInputPartitions(o3, o3).isEmpty)
    // drained: the offset must not advance (Spark's "no new data" signal)
    assert(ac.latestOffset(o3, limit) == o3)
  }

  test("streaming from a branch: the stream tails the branch ref, not main") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.br")
    spark.sql("CREATE TABLE lake.stream.br (k BIGINT)")
    spark.sql("INSERT INTO lake.stream.br VALUES (1)")
    spark.sql("CALL lake.system.create_branch('stream.br', 'audit')")
    val q = spark.readStream.option("branch", "audit").table("lake.stream.br")
      .writeStream.format("memory").queryName("br_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      import spark.implicits._
      assert(spark.table("br_out").as[Long].collect().toSeq == Seq(1L))
      // branch append arrives on the branch stream; a main commit does not
      spark.sql("SELECT CAST(2 AS BIGINT) AS k").writeTo("lake.stream.br")
        .option("branch", "audit").append()
      spark.sql("INSERT INTO lake.stream.br VALUES (99)") // main only
      q.processAllAvailable()
      assert(spark.table("br_out").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
        "the branch stream must see branch commits and ignore main's")
    } finally q.stop()
  }

  test("main stream crosses a fast_forward: adopted branch commits stream as appends") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.ff")
    spark.sql("CREATE TABLE lake.stream.ff (k BIGINT)")
    spark.sql("INSERT INTO lake.stream.ff VALUES (1)")
    val q = spark.readStream.table("lake.stream.ff")
      .writeStream.format("memory").queryName("ff_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.sql("CALL lake.system.create_branch('stream.ff', 'side')")
      spark.sql("SELECT CAST(2 AS BIGINT) AS k").writeTo("lake.stream.ff")
        .option("branch", "side").append()
      q.processAllAvailable()
      assert(spark.table("ff_out").count() == 1, "branch-only commits stay invisible to main")
      spark.sql("CALL lake.system.fast_forward('stream.ff', 'side')")
      q.processAllAvailable()
      import spark.implicits._
      assert(spark.table("ff_out").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
        "after fast_forward the adopted branch commit streams exactly once")
    } finally q.stop()
  }

  test("session windows (batch replay): gap merging produces hand-computed sessions") {
    import spark.implicits._
    val df = Seq[Ev](
      (1L, ts(0), 1L, "a", 1.0), (2L, ts(10), 1L, "a", 1.0), // session 1 (gap 15m)
      (3L, ts(40), 1L, "a", 1.0), // session 2
      (4L, ts(0), 2L, "a", 1.0) // user 2, one session
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventsStreaming.sessionized(df, "15 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("user_id") == 1L && out(0).getAs[Long]("n_events") == 2)
    assert(out(1).getAs[Long]("user_id") == 1L && out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("user_id") == 2L && out(2).getAs[Long]("n_events") == 1)
  }

  test("stream-stream interval join: purchases attribute preceding clicks; late rows past the watermark drop") {
    import spark.implicits._
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val q = EventsStreaming.attributedClicks(
        toDf(purchases.toDF()), toDf(clicks.toDF()), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("attributed").outputMode("append")
      .start()
    // user 1: clicks at minute 0 and 8, purchase at minute 10 → both attribute
    // (interval [0, 10] inclusive); user 2's click has no purchase.
    clicks.addData((1L, ts(0), 1L, "click", 0.0), (2L, ts(8), 1L, "click", 0.0),
      (3L, ts(8), 2L, "click", 0.0))
    purchases.addData((10L, ts(10), 1L, "purchase", 5.0))
    q.processAllAvailable()
    val first = spark.table("attributed").orderBy("purchase_id", "click_id").collect()
    assert(first.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 1L), (10L, 2L)))
    assert(first.forall(_.getAs[Double]("purchase_value") == 5.0))
    // advance both watermarks to ~minute 190 (state for minute-scale rows evicts)
    clicks.addData((4L, ts(200), 9L, "click", 0.0))
    purchases.addData((11L, ts(200), 9L, "purchase", 1.0))
    q.processAllAvailable()
    // a purchase far below the watermark is late → dropped, no resurrected matches
    purchases.addData((12L, ts(12), 1L, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attributed").orderBy("purchase_id", "click_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((10L, 1L), (10L, 2L), (11L, 4L)))
  }

  test("stream-static join: stream enriches from a lake dim table; dim updates visible to later micro-batches") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.dim_users")
    spark.sql("CREATE TABLE lake.stream.dim_users (user_id BIGINT, tier STRING)")
    spark.sql("INSERT INTO lake.stream.dim_users VALUES (1, 'free'), (2, 'pro')")
    val input = MemoryStream[Ev](spark)
    val enriched = toDf(input.toDF())
      .join(spark.table("lake.stream.dim_users"), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("tier"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    input.addData((1L, ts(0), 1L, "click", 0.0), (2L, ts(1), 2L, "click", 0.0),
      (3L, ts(2), 3L, "click", 0.0)) // user 3 not in dim yet
    q.processAllAvailable()
    // the static side is re-planned per micro-batch: a dim commit between
    // batches must be visible to the NEXT batch (lake scans resolve their
    // file list at scan-build time, not stream-start time)
    spark.sql("INSERT INTO lake.stream.dim_users VALUES (3, 'enterprise')")
    input.addData((4L, ts(3), 3L, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enriched").orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("tier")).getOrElse("∅")))
    assert(out.toSeq == Seq((1L, "free"), (2L, "pro"), (3L, "∅"), (4L, "enterprise")),
      s"got ${out.toSeq}")
  }

  test("streaming across WAP: staged rows arrive exactly once, at publish time") {
    import org.apache.spark.sql.functions.col
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stream")
    spark.sql("DROP TABLE IF EXISTS lake.stream.wap")
    spark.sql("CREATE TABLE lake.stream.wap (k BIGINT)")
    spark.sql("INSERT INTO lake.stream.wap VALUES (1)")
    val q = spark.readStream.table("lake.stream.wap")
      .writeStream.format("memory").queryName("wap_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("wap_out").select(col("k")).collect().map(_.getLong(0)).toSeq == Seq(1L))
      // stage a commit: the stream must NOT deliver it (pointer unmoved)
      spark.sql("ALTER TABLE lake.stream.wap SET TBLPROPERTIES ('wap.enabled'='true')")
      spark.sql("INSERT INTO lake.stream.wap VALUES (2)")
      q.processAllAvailable()
      assert(spark.table("wap_out").count() == 1, "staged rows must stay invisible to the stream")
      // publish: the staged rows arrive, exactly once
      val staged = {
        import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
        val t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
          .loadTable(Identifier.of(Array("stream"), "wap")).asInstanceOf[graft.catalog.LakeTable]
        t.meta.snapshots.filter(_.operation == "stage-append").last.snapshotId
      }
      graft.catalog.LakeMaintenance.publish(spark, "lake.stream.wap", staged)
      q.processAllAvailable()
      assert(spark.table("wap_out").select(col("k")).collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L), "published rows arrive exactly once")
    } finally q.stop()
  }

  test("flatMapGroupsWithState quota sampling: per-source budgets persist across micro-batches") {
    import spark.implicits._
    // (source, doc_id, tokens): every doc is 10 tokens so the accepted
    // count is order-independent within a batch (intra-group iteration
    // order is not deterministic)
    val docs = MemoryStream[(String, Long, Long)](spark)
    val q = EventsStreaming.quotaSampled(
        docs.toDF().toDF("source", "doc_id", "tokens"), quotaTokens = 100L)
      .writeStream.format("memory").queryName("quota_out").outputMode("append")
      .start()
    try {
      // batch 1: A uses 50 of 100, B uses 20
      docs.addData((1L to 5L).map(i => ("A", i, 10L)) ++ Seq(("B", 100L, 10L), ("B", 101L, 10L)): _*)
      q.processAllAvailable()
      assert(spark.table("quota_out").groupBy("source").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap == Map("A" -> 5L, "B" -> 2L))
      // batch 2: A's budget (50 left) admits exactly 5 of 8 — state carried over
      docs.addData((6L to 13L).map(i => ("A", i, 10L)): _*)
      q.processAllAvailable()
      // batch 3: A is exhausted, B still under budget
      docs.addData(("A", 20L, 10L), ("B", 102L, 10L))
      q.processAllAvailable()
      val counts = spark.table("quota_out").groupBy("source").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(counts == Map("A" -> 10L, "B" -> 3L),
        s"quota must cap A at 100 tokens (10 docs) across batches: $counts")
      val tok = spark.table("quota_out").groupBy("source")
        .agg(org.apache.spark.sql.functions.sum("tokens")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(tok == Map("A" -> 100L, "B" -> 30L))
    } finally q.stop()
  }

  test("transformWithState sessions: event-time timers close idle sessions, state evicts") {
    import spark.implicits._
    // transformWithState is backed by the RocksDB state store
    val prevProv = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev](spark)
    val q = graft.streaming.SessionTws.sessionProfiles(
        toDf(input.toDF()), gapMinutes = 15, watermarkDelay = "30 minutes")
      .toDF()
      .writeStream.format("memory").queryName("tws_sessions").outputMode("append")
      .start()
    try {
      // batch 1: u1 two events 10m apart (one session, 2 types), u2 one event
      input.addData(
        (1L, ts(1), 1L, "view", 1.5), (2L, ts(11), 1L, "click", 2.5),
        (3L, ts(3), 2L, "view", 4.0))
      q.processAllAvailable()
      // nothing closed yet: watermark is far behind every last+gap
      assert(spark.table("tws_sessions").isEmpty)

      // batch 2: u1 event at minute 40 opens a SECOND session (40 >= 11+15)
      // but closes NOTHING — sessions emit only when the watermark passes
      // last+gap, never at input time, so a late-but-admissible row can
      // still merge into the first session
      input.addData((4L, ts(40), 1L, "purchase", 8.0))
      q.processAllAvailable()
      assert(spark.table("tws_sessions").isEmpty,
        "sessions must close by WATERMARK, not at input time")

      // batch 3: the late-but-admissible row the watermark still admits
      // (wm = 40m - 30m = 10m; the row is at 12m) — it must merge into
      // u1's still-open FIRST session exactly as the batch replay would
      input.addData((5L, ts(12), 1L, "error", 0.5))
      q.processAllAvailable()
      assert(spark.table("tws_sessions").isEmpty)

      // batch 4: a far-future event advances the watermark past every open
      // session's last+gap — the EVENT-TIME TIMERS fire, close all three
      // sessions, and evict their state
      input.addData((6L, ts(600), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData((7L, ts(601), 9L, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("tws_sessions")
        .orderBy("user_id", "session_start").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_types"), r.getAs[Double]("sum_value")))
      assert(rows.toSeq == Seq((1L, 3L, 3L, 4.5), (1L, 1L, 1L, 8.0), (2L, 1L, 1L, 4.0)),
        s"timer-closed sessions must match the batch islands replay: ${rows.toSeq}")
    } finally {
      q.stop()
      prevProv match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
