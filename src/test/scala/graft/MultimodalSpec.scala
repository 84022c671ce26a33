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

  private def wavBytes(rate: Float, channels: Int, amp: Double, hz: Double,
      nFrames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, channels,
      2 * channels, rate, false)
    val pcm = new Array[Byte](nFrames * 2 * channels)
    var f = 0
    while (f < nFrames) {
      val s = (amp * math.sin(2 * math.Pi * hz * f / rate) * 32767).toInt.toShort
      var c = 0
      while (c < channels) {
        val off = (f * channels + c) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decode_audio: real WAV decode — rate/channels/frames/duration/rms/peak") {
    val amp = 0.5
    val payloads = Seq(
      1L -> wavBytes(8000f, 1, amp, 440.0, 8000), // 1 s mono
      2L -> wavBytes(16000f, 2, amp, 220.0, 4000), // 0.25 s stereo
      3L -> "definitely not audio".getBytes("UTF-8"))
    val rows = payloads.toDF("id", "payload")
      .select(col("id"), expr("decode_audio(payload)").as("a"))
      .orderBy("id").collect()

    val a1 = rows(0).getStruct(1)
    assert(a1.getInt(0) == 8000 && a1.getInt(1) == 1 && a1.getLong(2) == 8000L)
    assert(math.abs(a1.getDouble(3) - 1000.0) < 1e-6) // duration ms
    // a full-period sine's RMS = amp/sqrt(2); many whole periods of 440 Hz
    assert(math.abs(a1.getDouble(4) - amp / math.sqrt(2)) < 0.01,
      s"sine RMS: ${a1.getDouble(4)}")
    assert(math.abs(a1.getDouble(5) - amp) < 0.01, s"sine peak: ${a1.getDouble(5)}")

    val a2 = rows(1).getStruct(1)
    assert(a2.getInt(0) == 16000 && a2.getInt(1) == 2 && a2.getLong(2) == 4000L)
    assert(math.abs(a2.getDouble(3) - 250.0) < 1e-6)

    assert(rows(2).isNullAt(1), "non-audio payload must decode to NULL")
  }

  test("decode_audio: codegen and interpreted agree") {
    val payloads = Seq(1L -> wavBytes(8000f, 1, 0.25, 100.0, 1600),
      2L -> Array[Byte](1, 2, 3))
    val df = payloads.toDF("id", "payload")
      .select(col("id"), expr("decode_audio(payload)").as("a"))
    val viaCodegen = df.collect()
    withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = payloads.toDF("id", "payload")
        .select(col("id"), expr("decode_audio(payload)").as("a")).collect()
      assert(viaCodegen.map(_.toString).toSeq == interp.map(_.toString).toSeq)
    }
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

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
