package graft.catalog

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg's time partition transforms (`years/months/days/hours(col)`) —
  * the canonical 100 TB fact-table layout: clustered daily files, per-day
  * dynamic-overwrite backfills, and (because the transforms are MONOTONIC
  * in the source value) range predicates on the raw timestamp prune files
  * through the ordinary min/max stats with no transform-aware pruner at
  * all. Units follow the Iceberg spec: years/months since 1970, days/hours
  * since the epoch, floor semantics for pre-1970 values.
  *
  * ONE definition serves the writer's per-row partition key, the V2
  * catalog functions (write clustering + storage-partitioned joins), and
  * the maintenance jobs' Column expressions — they can never disagree.
  */
object TimeTransform {
  val Units: Set[String] = Set("years", "months", "days", "hours")

  private val MicrosPerHour = 3_600_000_000L
  private val MicrosPerDay = 86_400_000_000L

  /** Transformed unit value from the INTERNAL representation (micros for
    * timestamps, epoch days for dates). Null-safe callers only.
    */
  def apply(unit: String, value: Any, dt: DataType): Int = {
    val epochDays: Long = dt match {
      case DateType => value.asInstanceOf[Int].toLong
      case TimestampType | TimestampNTZType =>
        Math.floorDiv(value.asInstanceOf[Long], MicrosPerDay)
      case other => throw new IllegalArgumentException(
        s"time transform '$unit' needs a date/timestamp column, got $other")
    }
    unit match {
      case "days" => Math.toIntExact(epochDays)
      case "hours" => dt match {
        case DateType => Math.toIntExact(epochDays * 24L)
        case _ => Math.toIntExact(
          Math.floorDiv(value.asInstanceOf[Long], MicrosPerHour))
      }
      case "months" =>
        val d = LocalDate.ofEpochDay(epochDays)
        (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      case "years" => LocalDate.ofEpochDay(epochDays).getYear - 1970
      case other => throw new IllegalArgumentException(s"unknown time unit '$other'")
    }
  }

  /** The V2 Transform for declaration surfaces (Table.partitioning,
    * required write distribution, SPJ output partitioning) — the dedicated
    * DaysTransform-family shapes Spark itself builds for
    * `PARTITIONED BY (days(col))`.
    */
  def v2(unit: String, col: String): org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    unit match {
      case "years" => Expressions.years(col)
      case "months" => Expressions.months(col)
      case "days" => Expressions.days(col)
      case "hours" => Expressions.hours(col)
    }
  }

  /** The same transform as a Column over the PHYSICAL source column — what
    * maintenance jobs (compaction/z-order) cluster rewrites by. Arithmetic
    * mirrors [[apply]] exactly: floor division on epoch seconds composes
    * to floor division on micros.
    */
  def column(unit: String, c: Column, dt: DataType): Column = {
    val days: Column = dt match {
      case DateType => datediff(c, to_date(lit("1970-01-01")))
      case _ => floor(c.cast("double") / 86400d).cast("int")
    }
    unit match {
      case "days" => days
      case "hours" => dt match {
        case DateType => days * 24
        case _ => floor(c.cast("double") / 3600d).cast("int")
      }
      case "months" => (year(c) - 1970) * 12 + (month(c) - 1)
      case "years" => year(c) - 1970
    }
  }
}

/** The V2 catalog functions behind `PARTITIONED BY (days(col))` etc. —
  * resolved through [[LakeCatalog]]'s FunctionCatalog for write clustering
  * and storage-partitioned-join co-partition proofs, mirroring
  * [[BucketFunction]].
  */
final case class TimeFunction(unit: String) extends UnboundFunction {
  override def name(): String = unit
  override def description(): String = s"$unit(col): time partition transform"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 1)
      throw new UnsupportedOperationException(s"$unit expects (value), got $inputType")
    inputType.fields(0).dataType match {
      case DateType | TimestampType | TimestampNTZType =>
        Bound(unit, inputType.fields(0).dataType)
      case other => throw new UnsupportedOperationException(
        s"$unit expects a date/timestamp column, got $other")
    }
  }

  final case class Bound(unit: String, valueType: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(valueType)
    override def resultType(): DataType = IntegerType
    override def name(): String = unit
    override def canonicalName(): String = s"graft.$unit"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      TimeTransform(unit, input.get(0, valueType), valueType)
  }
}
