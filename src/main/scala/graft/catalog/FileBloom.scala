package graft.catalog

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.util.hashing.MurmurHash3

/** FILE-level Bloom filter over one column's values, carried in a manifest
  * SIDECAR (`<manifest>.bloom`) so point predicates can drop whole files
  * from the plan without opening a single footer — the layer ABOVE the
  * parquet row-group blooms the same `write.bloom-columns` property already
  * enables. Min/max pruning is useless for a needle lookup on a column
  * whose values interleave across files (every file's range covers the
  * needle); a per-file bloom answers "definitely not in this file" from
  * metadata alone. Iceberg keeps the same structure in puffin files beside
  * its manifests; the reference's catalog stores no file stats at all
  * (reference: src/catalog/mod.rs:217-220 treats metadata as opaque), so
  * this is engine-side capability the delegating design leaves to us.
  *
  * Soundness: a bloom has no false negatives, so "absent" is a proof and
  * "present" degrades to keeping the file — identical failure mode to
  * min/max. Deletes (positional or equality) only remove rows, so a
  * value-absence proof survives them. Sizing is fixed per file per column
  * (`write.bloom-bits`, default 128 Ki bits = 16 KiB): past ~20k distinct
  * values per file the filter saturates toward keep-everything — it never
  * becomes wrong, only useless, which is the right degradation at scale.
  *
  * Hashing is double-hashed MurmurHash3 over a CANONICAL string rendering
  * shared by the writer (which sees row values) and the pruner (which sees
  * Catalyst literals); both sides must produce byte-identical keys or
  * pruning would be unsound, hence the single [[FileBloom.canonical]].
  */
final class FileBloom(val k: Int, val bits: Array[Long]) {
  private val m = bits.length * 64

  private def eachBit(value: String)(f: Int => Boolean): Boolean =
    eachBitHashed(FileBloom.hashes(value))(f)

  // the double-hash pair is m-independent, so a key hashed ONCE probes any
  // number of per-file blooms — planning over many (file, delete) pairs
  // hashes each delete key once, not once per pair
  private def eachBitHashed(packed: Long)(f: Int => Boolean): Boolean = {
    val h1 = (packed >>> 32).toInt
    val h2 = packed.toInt
    var i = 0
    while (i < k) {
      if (!f(java.lang.Integer.remainderUnsigned(h1 + i * h2, m))) return false
      i += 1
    }
    true
  }

  def add(value: String): Unit =
    eachBit(value) { pos => bits(pos >>> 6) |= 1L << (pos & 63); true }

  /** False ⇒ the value is PROVABLY absent from the file. */
  def mightContain(value: String): Boolean =
    eachBit(value)(pos => (bits(pos >>> 6) & (1L << (pos & 63))) != 0L)

  /** [[mightContain]] from a [[FileBloom.hashes]]-precomputed pair. */
  def mightContainHashed(packed: Long): Boolean =
    eachBitHashed(packed)(pos => (bits(pos >>> 6) & (1L << (pos & 63))) != 0L)

  /** `"k:base64(bits)"` — what [[DataFileMeta.blooms]] carries. */
  def encode: String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    s"$k:${Base64.getEncoder.encodeToString(bb.array())}"
  }
}

object FileBloom {
  private[catalog] val Seed1 = 0x7A3C9F15
  private[catalog] val Seed2 = 0x51E0D2B7

  /** The (h1, h2) double-hash pair of a canonical key, packed into one
    * long — independent of any particular filter's size, so it can be
    * precomputed once per key and probed against many files' blooms.
    */
  def hashes(value: String): Long = {
    val bytes = value.getBytes(StandardCharsets.UTF_8)
    val h1 = MurmurHash3.bytesHash(bytes, Seed1)
    val h2 = MurmurHash3.bytesHash(bytes, Seed2) | 1 // odd => full cycle
    (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
  }
  val DefaultBits = 131072 // 16 KiB/file/column; `write.bloom-bits` overrides
  val Hashes = 6

  def apply(mBits: Int, k: Int = Hashes): FileBloom =
    new FileBloom(k, new Array[Long](math.max(1, (mBits + 63) / 64)))

  def decode(s: String): Option[FileBloom] = try {
    val sep = s.indexOf(':')
    if (sep <= 0) None
    else {
      val bytes = Base64.getDecoder.decode(s.substring(sep + 1))
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val longs = new Array[Long](bytes.length / 8)
      longs.indices.foreach(i => longs(i) = bb.getLong)
      val k = s.substring(0, sep).toInt
      // A truncated sidecar ("6:") would decode to m = 0 and the first probe
      // would divide by zero AT PLANNING TIME; malformed payload = no bloom.
      if (longs.isEmpty || k <= 0) None
      else Some(new FileBloom(k, longs))
    }
  } catch { case _: Exception => None }

  /** The ONE value→key rendering both the writer and the pruner use.
    * Renderings must agree across the two shapes a value takes: the
    * writer's tracked scalar (boxed JVM primitive / java BigDecimal /
    * UTF8String-toString) and the pruner's Catalyst literal (boxed
    * primitive / Spark Decimal / UTF8String). Zeros normalize (-0.0 == 0.0
    * in SQL equality), decimals drop trailing zeros (literal and column
    * scale may differ), temporal types pass through as their internal
    * int/long. None ⇒ type not bloom-indexable ⇒ caller must not prune.
    */
  def canonical(v: Any): Option[String] = v match {
    case null => None
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case s: String => Some(s)
    case d: org.apache.spark.sql.types.Decimal => Some(plain(d.toJavaBigDecimal))
    case d: java.math.BigDecimal => Some(plain(d))
    case d: java.lang.Double => Some(if (d.doubleValue() == 0.0) "0.0" else d.toString)
    case f: java.lang.Float => Some(if (f.floatValue() == 0.0f) "0.0" else f.toString)
    case n: java.lang.Number => Some(n.toString) // Int/Long/Short + date/ts internals
    case b: java.lang.Boolean => Some(b.toString)
    case _ => None
  }

  private def plain(d: java.math.BigDecimal): String =
    d.stripTrailingZeros.toPlainString
}
