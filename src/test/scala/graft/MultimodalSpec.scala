package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** decode_image is a REAL decoder (JDK ImageIO — no external codec libs):
  * these tests feed genuine PNG/BMP/JPEG bytes generated in-process and pin
  * exact (PNG/BMP) or approximate (JPEG) gray-grid features.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def image(w: Int, h: Int)(rgbAt: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
    img
  }

  private def bytes(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"JDK must encode $format")
    bos.toByteArray
  }

  private def luma(r: Int, g: Int, b: Int): Double =
    (0.299 * r + 0.587 * g + 0.114 * b) / 255.0

  private def decode(payloads: Seq[(Long, Array[Byte])]): Array[Row] =
    payloads.toDF("id", "payload")
      .select(col("id"), expr("decode_image(payload, 8)").as("img"))
      .orderBy("id").collect()

  test("decode_image: PNG and BMP decode with exact dimensions, format, gray values") {
    val solid = image(16, 16)((_, _) => (100 << 16) | (150 << 8) | 200)
    val rows = decode(Seq(1L -> bytes(solid, "png"), 2L -> bytes(solid, "bmp")))
    val expected = luma(100, 150, 200)
    for ((row, fmt) <- rows.zip(Seq("png", "bmp"))) {
      val img = row.getStruct(1)
      assert(img.getInt(0) == 16 && img.getInt(1) == 16)
      assert(img.getString(2) == fmt)
      val gray = img.getSeq[Double](3)
      assert(gray.length == 64)
      gray.foreach(v => assert(math.abs(v - expected) < 1e-9,
        s"$fmt solid-color cell must equal BT.601 luma exactly: $v vs $expected"))
    }
  }

  test("decode_image: gradient features are spatially faithful") {
    // left-to-right black->white ramp
    val grad = image(64, 64) { (x, _) => val v = x * 255 / 63; (v << 16) | (v << 8) | v }
    val img = decode(Seq(1L -> bytes(grad, "png"))).head.getStruct(1)
    val gray = img.getSeq[Double](3)
    // row-major 8x8: first column dark, last column bright, monotone across
    for (row <- 0 until 8) {
      val cells = (0 until 8).map(cx => gray(row * 8 + cx))
      assert(cells.head < 0.1 && cells.last > 0.9, s"ramp endpoints wrong: $cells")
      assert(cells == cells.sorted, s"ramp must be monotone: $cells")
    }
  }

  test("decode_image: JPEG decodes (lossy tolerance); garbage and empty yield NULL") {
    val solid = image(16, 16)((_, _) => (100 << 16) | (150 << 8) | 200)
    val rows = decode(Seq(
      1L -> bytes(solid, "jpg"),
      2L -> "definitely not an image".getBytes("UTF-8"),
      3L -> Array.empty[Byte]))
    val jpeg = rows(0).getStruct(1)
    assert(jpeg.getString(2) == "jpeg" && jpeg.getInt(0) == 16)
    jpeg.getSeq[Double](3).foreach(v =>
      assert(math.abs(v - luma(100, 150, 200)) < 0.05, s"JPEG gray off: $v"))
    assert(rows(1).isNullAt(1), "garbage bytes must decode to NULL")
    assert(rows(2).isNullAt(1), "empty payload must decode to NULL")
  }

  test("decode_image composes over sample_frames (the q54 pipeline shape)") {
    // a frame boundary that slices a real PNG in half must not crash —
    // partial frames are simply not decodable
    val png = bytes(image(32, 32)((_, _) => 0x808080), "png")
    val out = Seq((1L, png)).toDF("id", "payload")
      .select(explode(expr("sample_frames(payload, 100000, 1)")).as("frame"))
      .select(expr("decode_image(frame, 4)").as("img"))
      .collect()
    // frameBytes >= payload: the single frame IS the whole png -> decodes
    assert(out.length == 1 && !out(0).isNullAt(0))
    val half = Seq((1L, png)).toDF("id", "payload")
      .select(explode(expr(s"sample_frames(payload, ${png.length / 2}, 2)")).as("frame"))
      .select(expr("decode_image(frame, 4)").as("img"))
      .collect()
    assert(half.forall(r => r.isNullAt(0) || !r.isNullAt(0))) // no crash; truncated likely NULL
  }
}
