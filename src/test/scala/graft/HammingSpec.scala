package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HammingDistance

/** `hamming_distance` expression semantics (q128's verify predicate).
  * Losslessness of the banded candidate generation is proven by the
  * DuckDB oracle gate itself (brute-force oracle vs banded plan at three
  * SFs); here we pin the expression: byte-based counting, NULL on length
  * mismatch, codegen ≡ interpreted ≡ local model.
  */
class HammingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def viaSql(a: String, b: String): Any =
    spark.sql(s"SELECT hamming_distance('$a', '$b')").collect().head.get(0)

  test("byte-based distance: known values, identity, and full mismatch") {
    assert(viaSql("abc", "abc") == 0)
    assert(viaSql("abc", "abd") == 1)
    assert(viaSql("abc", "xyz") == 3)
    assert(viaSql("000012345", "000012354") == 2)
    assert(viaSql("", "") == 0)
  }

  test("length mismatch is NULL, not an error (byte lengths: multi-byte chars count)") {
    assert(viaSql("abc", "abcd") == null)
    // 'é' is two UTF-8 bytes vs one for 'e' — byte semantics say NULL
    assert(viaSql("é", "e") == null)
    // equal byte lengths compare bytewise: 'é' (0xC3 0xA9) vs 'è' (0xC3 0xA8)
    assert(viaSql("é", "è") == 1)
  }

  test("null propagation and dataframe (codegen) path match a local model") {
    val rnd = new scala.util.Random(3)
    def word() = Array.fill(8)(('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = Seq.fill(200)((word(), word())) :+ ((null: String), "abc")
    val got = pairs.toDF("a", "b")
      .select(expr("hamming_distance(a, b)")).collect().map(_.get(0))
    val want = pairs.map {
      case (null, _) | (_, null) => null
      case (a, b) => a.zip(b).count { case (x, y) => x != y }
    }
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def lit(s: String) = Literal(UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType)
    assert(HammingDistance(lit("hello"), lit("hallo")).eval(null) == 1)
    assert(HammingDistance(lit("ab"), lit("abc")).eval(null) == null)
  }
}
