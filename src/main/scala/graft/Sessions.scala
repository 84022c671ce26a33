package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession construction so Verify / Bench / tests share one
  * scale-aware config. Designed for a real cluster (partition counts and
  * AQE settings hold at 1000 executors); `master` is only `local[N]` here.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE: runtime coalescing, skew-join splitting, broadcast demotion —
      // the knobs that keep the same plan viable from sf0.001 to 100 TB.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Storage-partitioned joins: two lake tables partitioned on the same
      // key join WITHOUT shuffling either side (scans report
      // KeyGroupedPartitioning from clustered-file metadata).
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "false")
      // Custom codegen expressions (minhash_signature / simhash /
      // cosine_sim) registered as SQL functions.
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects;
      // read as long (nanos) and convert explicitly (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write µs-precision int64 timestamps (matches the DuckDB oracle and
      // every modern reader; INT96 is deprecated).
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      // Catalog plugin (SURVEY §7 M3): `lake` resolves through our
      // Derby-backed pointer store — see graft.catalog.LakeCatalog.
      .config("spark.sql.catalog.lake", "graft.catalog.LakeCatalog")
      .config("spark.sql.catalog.lake.warehouse", defaultWarehouse)
      .config("spark.sql.catalog.lake.jdbc.url", defaultJdbcUrl)

  /** Per-process scratch warehouse; catalog tables created by queries live
    * here. Cleaned up lazily by the OS tmp reaper.
    */
  lazy val defaultWarehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-warehouse")
    d.toString
  }

  /** Embedded in-memory Derby — same `iceberg_tables` contract as the
    * reference's Postgres (reference: src/catalog/mod.rs:365-385); the SQL
    * dialect shim makes the store portable to Postgres in prod.
    */
  lazy val defaultJdbcUrl: String =
    s"jdbc:derby:memory:graft${ProcessHandle.current().pid()};create=true"
}
