package graft.catalog

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.UpsRow

/** `readLive` is the liveness-preserving read every rewrite job (compaction,
  * z-order, CDC) builds on. Its plan must stay CONSTANT-width as streaming
  * epochs accumulate: one scan of the data files plus one scan of the
  * equality-delete files, applicability decided per row by sequence-number
  * comparison — not one union branch per epoch, which on a long-running
  * stream would grow the compaction plan without bound.
  */
class ReadLiveSpec extends AnyFunSuite {
  import graft.TestSpark._

  test("readLive plans constant width and matches the table scan after many epochs") {
    import spark.implicits._
    val t = s"lake.ups.rl${System.nanoTime() % 1000000}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ups")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING, n INT)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rl").toString
    val input = MemoryStream[UpsRow](spark)
    val q = input.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .option("upsert-keys", "k")
      .toTable(t)
    try {
      // 8 epochs, each overwriting a sliding window of keys
      (0 until 8).foreach { e =>
        input.addData((1L to 20L).map(i =>
          UpsRow((i + e * 7) % 40, s"e$e-$i", e)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val Array(cat, ns, name) = t.split('.')
    val lake = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val meta = lake.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name))
      .asInstanceOf[LakeTable].meta
    assert(meta.currentEqDeleteFiles.size >= 7, "each epoch after the first leaves eq-deletes")

    val df = LakeMaintenance.readLive(spark, meta, meta.currentFiles,
      meta.currentDeleteFiles, meta.currentEqDeleteFiles,
      spark.sessionState.newHadoopConf())

    // constant width: one parquet relation for data, one for delete keys —
    // NOT one branch per distinct applicable-delete set
    val fileRelations = df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l
    }
    assert(fileRelations.size <= 2,
      s"readLive must plan O(1) file relations, got ${fileRelations.size}")

    // semantics identical to the table's own merge-on-read scan
    val got = df.select("k", "v", "n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    val expected = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(got == expected, "readLive must reproduce the scan's live rows exactly")
    spark.sql(s"DROP TABLE $t")
  }
}
