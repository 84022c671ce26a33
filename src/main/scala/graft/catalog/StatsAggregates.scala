package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only aggregate pushdown (DSv2 `SupportsPushDownAggregates`).
  *
  * `SELECT count(*) / count(c) / min(c) / max(c) FROM t` is answered from
  * the manifest entries' exact per-file row counts, null counts and min/max
  * values — ZERO data files are opened. On a 100 TB table this turns a
  * full scan into a read of metadata the planner already holds; the plan
  * collapses to a `LocalTableScan` of one precomputed row (same approach as
  * Apache Iceberg's Spark aggregate pushdown).
  *
  * Pushdown is refused — Spark then runs the ordinary scan-and-aggregate
  * plan, so refusal is always safe — unless EVERY aggregate is provable
  * from stats:
  *   - no residual filters, no GROUP BY (Spark only attempts pushdown for
  *     filterless aggregates, but we re-check),
  *   - no positional or equality delete files in the scanned snapshot
  *     (tombstoned rows would make file stats over-count),
  *   - count(c): every live file carries a null count for `c`,
  *   - min/max(c): a supported scalar type, and every live file either
  *     carries min/max for `c` or provably holds only NULLs in `c`
  *     (nullCount == rowCount; writer stats skip all-null columns).
  *
  * Writer stats are exact (full values, never truncated — see
  * [[LakeDataWriter]]), so the pushed answer is exact, not approximate.
  */
object StatsAggregates {

  /** The aggregate output: schema Spark expects from the scan (one field
    * per aggregate expression, complete pushdown, global aggregation) and
    * the single result row.
    */
  final case class Pushed(schema: StructType, row: InternalRow)

  def compute(agg: Aggregation, tableSchema: StructType,
      files: Seq[DataFileMeta]): Option[Pushed] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val cols = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some(("count(*)", LongType: DataType, false,
          java.lang.Long.valueOf(files.map(_.rowCount).sum): Any))
      case c: Count if !c.isDistinct =>
        for {
          f <- fieldOf(c.column, tableSchema)
          nonNull <- countNonNull(f.name, files)
        } yield (s"count(${f.name})", LongType: DataType, false,
          java.lang.Long.valueOf(nonNull): Any)
      case m: Min =>
        for {
          f <- fieldOf(m.column, tableSchema)
          v <- minMax(f, files, wantMin = true)
        } yield (s"min(${f.name})", f.dataType, true, v.orNull: Any)
      case m: Max =>
        for {
          f <- fieldOf(m.column, tableSchema)
          v <- minMax(f, files, wantMin = false)
        } yield (s"max(${f.name})", f.dataType, true, v.orNull: Any)
      case _ => None // sum/avg/distinct/UDAF: not provable from stats
    }
    if (cols.exists(_.isEmpty)) return None
    val resolved = cols.map(_.get)
    val schema = StructType(resolved.map { case (n, dt, nullable, _) =>
      StructField(n, dt, nullable) })
    Some(Pushed(schema, new GenericInternalRow(resolved.map(_._4).toArray)))
  }

  /** Resolve a pushed column reference to a TOP-LEVEL schema field. */
  private def fieldOf(e: VExpression, schema: StructType): Option[StructField] = e match {
    case ref: NamedReference if ref.fieldNames.length == 1 =>
      val n = ref.fieldNames()(0)
      schema.fields.find(_.name == n)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(n)))
    case _ => None
  }

  /** Σ (rowCount − nullCount) — None if any file lacks a null count. */
  private def countNonNull(col: String, files: Seq[DataFileMeta]): Option[Long] =
    files.foldLeft(Option(0L)) { (acc, f) =>
      for (a <- acc; n <- f.nulls.get(col)) yield a + (f.rowCount - n)
    }

  /** Fold min/max stats across files. `Some(None)` = provably all-NULL
    * (a valid answer: the aggregate is NULL); `None` = not provable.
    */
  private def minMax(field: StructField, files: Seq[DataFileMeta],
      wantMin: Boolean): Option[Option[Any]] = {
    var best: Any = null
    files.foreach { f =>
      f.minValues.get(field.name).filter(_ => f.maxValues.contains(field.name)) match {
        case Some(_) =>
          val raw = if (wantMin) f.minValues(field.name) else f.maxValues(field.name)
          decode(field.dataType, raw) match {
            case Some(v) =>
              if (best == null) best = v
              else {
                val c = v.asInstanceOf[Comparable[Any]].compareTo(best)
                if ((wantMin && c < 0) || (!wantMin && c > 0)) best = v
              }
            case None => return None // undecodable / unsupported type
          }
        case None =>
          // no stat for this column: fine only if the file is all-NULL here
          if (!f.nulls.get(field.name).contains(f.rowCount)) return None
      }
    }
    Some(Option(best))
  }

  /** Parse a writer stat string back to the Catalyst internal value. The
    * encodings mirror [[LakeDataWriter.scalarAt]] (DateType stats are the
    * epoch-day int, timestamps the micros long, decimals the plain string);
    * comparison semantics match the writer's `Comparable` use — including
    * UTF8String binary order for strings and java.lang.{Float,Double}
    * ordering (NaN greatest) for floats, which is also Spark's SQL ordering.
    */
  private def decode(dt: DataType, s: String): Option[Any] = try {
    dt match {
      case IntegerType | DateType => Some(java.lang.Integer.valueOf(s.toInt))
      case LongType | TimestampType | TimestampNTZType =>
        Some(java.lang.Long.valueOf(s.toLong))
      case ShortType => Some(java.lang.Short.valueOf(s.toShort))
      case FloatType => Some(java.lang.Float.valueOf(s.toFloat))
      case DoubleType => Some(java.lang.Double.valueOf(s.toDouble))
      case BooleanType => Some(java.lang.Boolean.valueOf(s.toBoolean))
      case StringType => Some(UTF8String.fromString(s))
      case d: DecimalType =>
        val dec = Decimal(new java.math.BigDecimal(s))
        if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
      case _ => None
    }
  } catch { case _: NumberFormatException => None }
}

/** The scan produced when an aggregation was pushed: one precomputed row,
  * planned by Spark as a driver-local `LocalTableScanExec` — no tasks, no
  * file IO.
  */
final case class LakeStatsScan(ident: String, pushed: StatsAggregates.Pushed)
  extends LocalScan {
  override def readSchema(): StructType = pushed.schema
  override def rows(): Array[InternalRow] = Array(pushed.row)
  override def description(): String =
    s"$ident metadata-only aggregate ${pushed.schema.fieldNames.mkString(", ")}"
}
