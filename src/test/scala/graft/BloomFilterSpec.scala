package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** `write.bloom-columns`: writers emit parquet bloom filters for the listed
  * columns — row-group skipping for selective point predicates that the
  * min/max range check cannot prune (the needle-in-haystack scan at scale).
  */
class BloomFilterSpec extends AnyFunSuite {
  import TestSpark._

  private def uniq(p: String) = s"$p${System.nanoTime() % 1000000}"

  private def lakeMeta(t: String): TableMeta = {
    val Array(_, ns, name) = t.split('.')
    spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name))
      .asInstanceOf[LakeTable].meta
  }

  /** Column paths in `file` that carry a bloom filter. */
  private def bloomColsOf(file: String): Set[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      r.getRowGroups.asInstanceOf[java.util.List[org.apache.parquet.hadoop.metadata.BlockMetaData]]
        .toArray(Array.empty[org.apache.parquet.hadoop.metadata.BlockMetaData])
        .flatMap { bg =>
          val br = r.getBloomFilterDataReader(bg)
          bg.getColumns.toArray(Array.empty[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
            .filter(c => br.readBloomFilter(c) != null)
            .map(_.getPath.toDotString)
        }.toSet
    } finally r.close()
  }

  test("write.bloom-columns emits per-column bloom filters; reads stay exact") {
    val t = s"lake.bloom.${uniq("b")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bloom")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.bloom-columns'='id')")
    spark.sql(s"INSERT INTO $t SELECT id * 7919 % 100000, concat('v', id) FROM range(0, 20000)")

    val files = lakeMeta(t).currentFiles.map(_.path)
    assert(files.nonEmpty)
    files.foreach { f =>
      val cols = bloomColsOf(f)
      assert(cols.contains("id"), s"$f missing bloom filter for id (has: $cols)")
      assert(!cols.contains("v"), s"$f has unexpected bloom filter for v")
    }
    // point lookup through the scan stays exact
    val hit = spark.sql(s"SELECT v FROM $t WHERE id = ${3 * 7919 % 100000}").collect()
    assert(hit.map(_.getString(0)).contains("v3"))
    spark.sql(s"DROP TABLE $t")
  }

  test("write.target-file-bytes rolls files by size; stats stay per-file exact") {
    val t = s"lake.bloom.${uniq("roll")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bloom")
    spark.sql(s"CREATE TABLE $t (id BIGINT, pad STRING) " +
      "TBLPROPERTIES ('write.target-file-bytes'='65536')")
    // ~40 MB of raw data from one task → must roll into several files
    spark.sql("SELECT id, repeat(uuid(), 10) AS pad FROM range(0, 100000)")
      .coalesce(1).writeTo(t).append()
    val files = lakeMeta(t).currentFiles
    assert(files.size > 3, s"expected size-rolled files, got ${files.size}")
    // each file's min/max id stats stay exact and disjointly ordered rolls
    assert(files.map(_.rowCount).sum == 100000L)
    val agg = spark.sql(s"SELECT count(*) AS n, min(id) AS mn, max(id) AS mx FROM $t").collect()(0)
    assert(agg.getLong(0) == 100000L && agg.getLong(1) == 0L && agg.getLong(2) == 99999L)
    spark.sql(s"DROP TABLE $t")
  }

  test("compaction rewrites keep the bloom filters") {
    val t = s"lake.bloom.${uniq("c")}"
    val short = t.stripPrefix("lake.")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bloom")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.bloom-columns'='id')")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO $t SELECT id, concat('v', id) FROM range(${i * 100}, ${i * 100 + 100})"))
    spark.sql(s"CALL lake.system.compact('$short')")
    val files = lakeMeta(t).currentFiles.map(_.path)
    files.foreach(f => assert(bloomColsOf(f).contains("id"),
      s"compacted $f lost the id bloom filter"))
    assert(spark.table(t).count() == 300)
    spark.sql(s"DROP TABLE $t")
  }

  /** Codec of the first column chunk of `file`. */
  private def codecOf(file: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try r.getRowGroups.get(0).getColumns.get(0).getCodec.toString
    finally r.close()
  }

  test("write.parquet.compression-codec: zstd honored through write AND compaction") {
    val t = s"lake.bloom.${uniq("z")}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bloom")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)" +
      " TBLPROPERTIES ('write.parquet.compression-codec'='zstd')")
    spark.sql(s"INSERT INTO $t SELECT id, repeat('x', 50) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $t SELECT id, repeat('y', 50) FROM range(100, 200)")
    lakeMeta(t).currentFiles.foreach(f => assert(codecOf(f.path) == "ZSTD",
      s"writer must honor the codec property, got ${codecOf(f.path)}"))
    assert(spark.table(t).count() == 200, "zstd files read back fine")
    LakeMaintenance.compact(spark, t)
    val after = lakeMeta(t).currentFiles
    assert(after.size == 1)
    assert(codecOf(after.head.path) == "ZSTD", "compaction rewrites keep the codec")
    assert(spark.table(t).count() == 200)
    spark.sql(s"DROP TABLE $t")
  }
}
