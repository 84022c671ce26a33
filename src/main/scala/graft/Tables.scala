package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata (TESTDATA.md). One parquet per
  * table; `events.ts` is nanosecond-precision and needs an explicit cast.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (surfacing as Long
    * under spark.sql.legacy.parquet.nanosAsLong=true) and as TIMESTAMP(µs)
    * isAdjustedToUTC=false (surfacing as TIMESTAMP_NTZ) in different
    * testdata generations — adapt to whichever this dataset carries and
    * normalize to a µs TimestampType. The session timezone is pinned UTC
    * (Sessions), so the NTZ cast is value-identical to the nanos path and
    * to what DuckDB's reader produces; oracle comparisons line up exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Register every table as a temp view so shared ANSI SQL (run by both
    * spark.sql and the DuckDB oracle) resolves the same relations. View
    * registration is metadata-only but costs a schema-inference footer read
    * per table, so cache per (session, dir) — re-registering 10 tables per
    * query inflated every shared query's latency in r1's bench.
    */
  private val registeredDir = new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registeredDir.get(spark) != dir) synchronized {
      if (registeredDir.get(spark) != dir) {
        names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
        registeredDir.put(spark, dir)
      }
    }
}
