package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The engine's bucket hash: Spark's Murmur3 (seed 42 — identical to the
  * SQL `hash()` function) pmod the bucket count. ONE definition serves the
  * writer's file clustering/stats, the catalog's V2 bucket function (write
  * distribution + storage-partitioned joins), and any `pmod(hash(col), n)`
  * a query spells out by hand — they can never disagree.
  */
object BucketHash {
  val Seed = 42L
  def apply(numBuckets: Int, value: Any, dt: DataType): Int = {
    val h = Murmur3HashFunction.hash(value, dt, Seed).toInt
    ((h % numBuckets) + numBuckets) % numBuckets
  }
}

/** The V2 catalog function behind `PARTITIONED BY (bucket(n, col))`:
  * Spark resolves it through [[LakeCatalog]]'s FunctionCatalog both to
  * cluster rows on write (RequiresDistributionAndOrdering) and to prove
  * two bucketed tables co-partitioned for a storage-partitioned join.
  */
object BucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): murmur3 hash partition transform"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2 || inputType.fields(0).dataType != IntegerType)
      throw new UnsupportedOperationException(
        s"bucket expects (int numBuckets, value), got $inputType")
    Bound(inputType.fields(1).dataType)
  }

  final case class Bound(valueType: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    // constant across bindings: SPJ compares canonical names to decide two
    // scans' bucket transforms are the same function
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      BucketHash(input.getInt(0), input.get(1, valueType), valueType)
  }
}
