package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q161's canonical DOUBLE rendering (r11): the cross-engine checksum now
  * hashes doubles by their exact IEEE-754 bit pattern via normalized
  * hex-float. The Spark expression ([[graft.queries.Relational
  * .canonicalDoubleHex]]) is pinned here against an INDEPENDENT model that
  * formats the raw bits by hand — sign, minimal mantissa nibbles, unbiased
  * exponent — never calling any library float formatter. The DuckDB side
  * of the contract (printf('%a') with 'p+'→'p') is validated by the
  * driver's oracle gate on real data.
  */
class ChecksumSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Ground-truth formatter from raw bits (no float formatting library). */
  private def modelHex(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    val bits = java.lang.Double.doubleToRawLongBits(d)
    val sign = if (bits < 0) "-" else ""
    val exp = ((bits >> 52) & 0x7ff).toInt
    val frac = bits & 0xfffffffffffffL
    val fracHex = f"$frac%013x".reverse.dropWhile(_ == '0').reverse
    if (exp == 0) {
      if (frac == 0L) s"${sign}0x0p0" // ±zero — sign survives, a real bit
      else s"${sign}0x0.${fracHex}p-1022" // subnormal: leading zeros kept
    } else {
      val e = exp - 1023
      if (fracHex.isEmpty) s"${sign}0x1p$e"
      else s"${sign}0x1.${fracHex}p$e"
    }
  }

  private def viaSpark(ds: Seq[Double]): Seq[String] = {
    ds.toDF("d")
      .select(graft.queries.Relational.canonicalDoubleHex(col("d")))
      .collect().map(_.getString(0)).toSeq
  }

  test("edge values: nan canonicalizes, infinities tokenize, −0.0 stays distinct") {
    val edge = Seq(Double.NaN, java.lang.Double.longBitsToDouble(0x7ff8000000000123L),
      Double.PositiveInfinity, Double.NegativeInfinity, 0.0, -0.0,
      Double.MinPositiveValue, java.lang.Double.MIN_NORMAL, Double.MaxValue,
      1.0, -1.0, 0.1, 1.5, 2.0, -3.75, 1e-310)
    val got = viaSpark(edge)
    val want = edge.map(modelHex)
    got.zip(want).zip(edge).foreach { case ((g, w), v) =>
      assert(g == w, s"value $v: spark '$g' != model '$w'")
    }
    // every NaN payload → one token; the two zeros stay DIFFERENT rows
    assert(got(0) == "nan" && got(1) == "nan")
    assert(got(4) == "0x0p0" && got(5) == "-0x0p0")
  }

  test("property: 2000 random bit patterns render identically to the bits model") {
    val rnd = new scala.util.Random(11)
    val ds = Seq.fill(2000) {
      java.lang.Double.longBitsToDouble(rnd.nextLong())
    } ++ Seq.fill(500)(rnd.nextDouble() * math.pow(10, rnd.nextInt(40) - 20))
    val got = viaSpark(ds)
    val want = ds.map(modelHex)
    got.zip(want).zip(ds).foreach { case ((g, w), v) =>
      assert(g == w, s"bits ${java.lang.Double.doubleToRawLongBits(v)}: '$g' != '$w'")
    }
  }

  test("null propagates: a null double nulls the rendering (and so the row hash)") {
    val got = Seq((1L, Some(1.5)), (2L, None)).toDF("id", "d")
      .select(graft.queries.Relational.canonicalDoubleHex(col("d")))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("0x1.8p0") && got(1).isEmpty)
  }
}
