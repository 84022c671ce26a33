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
    * maintenance jobs (compaction/z-order) cluster rewrites by. Mirrors
    * [[apply]] EXACTLY, independent of the session time zone: TIMESTAMP
    * goes through `unix_micros` (UTC epoch micros — the same internal
    * value `apply` floors) with exact integer floor-division, and the
    * calendar units derive from the UTC epoch day, never from the
    * session-zone `year()`/`month()` of the timestamp. TIMESTAMP_NTZ
    * (which `unix_micros` and numeric casts reject) uses its tz-free
    * calendar fields directly — for a naive timestamp they ARE the
    * internal value's UTC fields.
    */
  def column(unit: String, c: Column, dt: DataType): Column = {
    // `a - pmod(a, b)` is the exact floor multiple; integral `div` keeps the
    // quotient exact for ALL longs (Column `/` is double division, which
    // drifts once |micros| exceeds 2^53 — timestamps before ~1685/after ~2255)
    def floorDiv(a: Column, b: Long): Column =
      call_function("div", a - pmod(a, lit(b)), lit(b))
    val epochDay: Column = dt match {
      case DateType => datediff(c, to_date(lit("1970-01-01")))
      case TimestampNTZType => datediff(to_date(c), to_date(lit("1970-01-01")))
      case _ => floorDiv(unix_micros(c), 86_400_000_000L).cast("int")
    }
    unit match {
      case "days" => epochDay
      case "hours" => dt match {
        case DateType => epochDay * 24
        case TimestampNTZType => epochDay * 24 + hour(c)
        case _ => floorDiv(unix_micros(c), 3_600_000_000L).cast("int")
      }
      case "months" | "years" =>
        // calendar fields of the UTC day (DATE's year/month are tz-free)
        val d = dt match {
          case DateType => c
          case TimestampNTZType => to_date(c)
          case _ => date_add(to_date(lit("1970-01-01")), epochDay)
        }
        if (unit == "years") year(d) - 1970
        else (year(d) - 1970) * 12 + (month(d) - 1)
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

/** Iceberg's `truncate(W, col)` transform: ints/longs floor to a multiple
  * of W (`v - (v floorMod W)`), strings keep their first W Unicode code
  * points. Monotonic like the time transforms, so raw-column min/max (and
  * the StartsWith pruner, for strings) already serve range pruning; the
  * transform's value is the clustered layout and dynamic-overwrite
  * attribution on high-cardinality sources.
  */
object TruncateTransform {
  def apply(w: Int, value: Any, dt: DataType): Any = dt match {
    case IntegerType =>
      val v = value.asInstanceOf[Int]
      v - Math.floorMod(v, w)
    case LongType =>
      val v = value.asInstanceOf[Long]
      v - Math.floorMod(v, w.toLong)
    case StringType =>
      // value is a UTF8String at write time; stats/keys carry java Strings
      val s = value.toString
      val end = s.offsetByCodePoints(0, math.min(w, s.codePointCount(0, s.length)))
      s.substring(0, end)
    case other => throw new IllegalArgumentException(
      s"truncate($w) supports int/bigint/string columns, got $other")
  }

  /** Same transform as a Column (maintenance clustering). */
  def column(w: Int, c: Column, dt: DataType): Column = dt match {
    case IntegerType | LongType => c - pmod(c, lit(w))
    case StringType => substring(c, 1, w) // BMP-safe enough for clustering
    case other => throw new IllegalArgumentException(
      s"truncate($w) supports int/bigint/string columns, got $other")
  }

  def v2(w: Int, col: String): org.apache.spark.sql.connector.expressions.Transform =
    org.apache.spark.sql.connector.expressions.Expressions.apply(
      "truncate", org.apache.spark.sql.connector.expressions.Expressions.literal(w),
      org.apache.spark.sql.connector.expressions.Expressions.column(col))
}

/** One place mapping a [[PartField]] to its V2 Transform declaration. */
object LakeTransforms {
  import org.apache.spark.sql.connector.expressions.{Expression, Expressions, Transform}
  def v2(f: PartField): Transform = (f.buckets, f.time, f.trunc) match {
    case (Some(n), _, _) => Expressions.bucket(n, f.source)
    case (_, Some(u), _) => TimeTransform.v2(u, f.source)
    case (_, _, Some(w)) => TruncateTransform.v2(w, f.source)
    case _ => Expressions.identity(f.source)
  }

  /** The clustering expression a WRITE declares for a partition field —
    * a plain column reference for identity, the V2 transform otherwise
    * (resolved through the catalog's FunctionCatalog). Shared by the
    * normal and the staged (CTAS) write paths.
    */
  def clusterExpr(f: PartField): Expression =
    if (f.isIdentity) Expressions.column(f.source) else v2(f)
}

/** V2 catalog function behind `PARTITIONED BY (truncate(W, col))` —
  * two-arg like [[BucketFunction]].
  */
object TruncFunction extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String = "truncate(width, col): prefix/floor partition transform"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2 || inputType.fields(0).dataType != IntegerType)
      throw new UnsupportedOperationException(
        s"truncate expects (int width, value), got $inputType")
    inputType.fields(1).dataType match {
      case IntegerType | LongType | StringType => Bound(inputType.fields(1).dataType)
      case other => throw new UnsupportedOperationException(
        s"truncate supports int/bigint/string columns, got $other")
    }
  }

  final case class Bound(valueType: DataType) extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
    override def resultType(): DataType = valueType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Any = {
      val w = input.getInt(0)
      valueType match {
        case StringType =>
          // keep the result an engine-internal UTF8String
          org.apache.spark.unsafe.types.UTF8String.fromString(
            TruncateTransform(w, input.getUTF8String(1), StringType).asInstanceOf[String])
        case dt => TruncateTransform(w, input.get(1, dt), dt)
      }
    }
  }
}
