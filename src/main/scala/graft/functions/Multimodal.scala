package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star "multimodal columns" operator):
  * treat image/audio/video payloads as opaque BINARY and run
  * decode/frame-sample as engine expressions.
  *
  * `decode_image` is a REAL decoder: the JDK's javax.imageio readers
  * (PNG/JPEG/BMP/GIF — no external libraries) decode the payload, and the
  * feature extraction (box-filtered grayscale grid, the aHash/dHash
  * precursor every dedup pipeline starts from) is hand-rolled pixel
  * arithmetic so results are bit-deterministic across JVMs. Undecodable
  * payloads yield NULL, so the expression composes safely over mixed
  * corpora.
  *
  * VIDEO-FRAME NOTE — the JDK ships exactly one multi-frame video
  * container codec (animated GIF), and since r12 `video_frames` is a REAL
  * decoder for it: seek to evenly spaced frame ordinals, decode each,
  * re-encode as a standalone PNG so the whole image toolchain
  * (`decode_image`, `phash64`) composes per frame (q193). `sample_frames`
  * remains alongside it as the deterministic byte-slicer for codec-less
  * payload formats (q50) — extracting `n` fixed-size slices at evenly
  * spaced offsets, the same data-flow shape with the decode stubbed.
  */
object Multimodal {
  def sampleFrames(payload: Column, frameBytes: Int, n: Int): Column =
    call_function("sample_frames", payload, lit(frameBytes), lit(n))

  /** REAL video-frame decode (r12): `n` evenly spaced frames of a
    * multi-frame container the JDK can read (animated GIF), each
    * re-encoded as a standalone PNG payload — so the whole image toolchain
    * (`decode_image`, `phash64`) composes per frame. NULL for payloads no
    * ImageIO reader accepts; a single-frame image is a 1-frame video.
    */
  def videoFrames(payload: Column, n: Int): Column =
    call_function("video_frames", payload, lit(n))

  /** struct(width, height, format, gray: array<double>) or NULL. */
  def decodeImage(payload: Column, grid: Int): Column =
    call_function("decode_image", payload, lit(grid))

  /** struct(sample_rate, channels, frames, duration_ms, rms, peak) or NULL. */
  def decodeAudio(payload: Column): Column =
    call_function("decode_audio", payload)

  /** 64-bit DCT perceptual hash (bigint) or NULL for non-images. */
  def phash64(payload: Column): Column =
    call_function("phash64", payload)

  /** Deterministic PNG fixture (JDK-encoded): a smooth seeded sinusoid
    * pattern — low-frequency content, so `phash64` is meaningful on it.
    * `brightness` adds a constant luma offset (lands in the DC term pHash
    * drops); `noisePixels` inverts that many LCG-chosen pixels (high
    * frequency, outside pHash's kept DCT block) — together the canonical
    * "same photo, re-processed" near-duplicate.
    */
  def syntheticPng(seed: Int, w: Int = 64, h: Int = 64,
      brightness: Int = 0, noisePixels: Int = 0): Array[Byte] = {
    val luma = renderLuma(seed, 0, w, h, brightness, noisePixels)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = luma(y * w + x)
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The fixture raster, factored out so the PNG (q92) and animated-GIF
    * (q193) fixtures share one authority. `frameShift = 0` reproduces the
    * original single-image math EXACTLY (q92's frozen phash literals must
    * not move); a video frame shifts every component's phase — smooth
    * temporal motion, distinct per-frame pHashes.
    */
  private def renderLuma(seed: Int, frameShift: Int, w: Int, h: Int,
      brightness: Int, noisePixels: Int): Array[Int] = {
    // dense spectrum (5 components, decaying amplitudes, seed-unique
    // frequency pairs) — keeps the 8×8 DCT block's coefficients well away
    // from the median so the hash is stable under small edits, like a
    // photo and unlike a flat synthetic gradient
    // amplitudes sum to 84; with the ±20 texture and 0..20 gradient the
    // luma never clips, so a small brightness offset stays a pure DC
    // shift (zero AC perturbation)
    val amp = Array(36.0, 22.0, 13.0, 8.0, 5.0)
    val kfx = Array.tabulate(5)(k => 1 + (seed + k * 5) % 4 + k)
    val kfy = Array.tabulate(5)(k => 1 + (seed / 4 + k * 3) % 3 + k)
    val kph = Array.tabulate(5)(k =>
      1.3 * seed + 2.1 * k + 0.37 * seed * k + 0.77 * frameShift * (k + 1))
    val luma = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0.0
        var k = 0
        while (k < 5) {
          s += amp(k) * StrictMath.sin(2 * StrictMath.PI *
            (kfx(k) * x.toDouble / w + kfy(k) * y.toDouble / h) + kph(k))
          k += 1
        }
        // seeded 4×4-block value texture (±20): fills the whole spectrum
        // with real energy so no DCT coefficient idles near the median —
        // the property that makes photo pHashes stable and synthetic
        // flat gradients jittery
        val th = (seed * 73856093) ^ ((x >> 2) * 19349663) ^ ((y >> 2) * 83492791)
        val tex = (((th * 2654435761L) >>> 24) % 41L - 20L).toInt
        val l0 = 120 + s.toInt + tex + (20 * x) / w + brightness
        luma(y * w + x) = math.max(0, math.min(255, l0))
        x += 1
      }
      y += 1
    }
    // sensor/compression-style jitter: ±24 luma on LCG-chosen pixels —
    // the high-frequency, low-amplitude perturbation a re-encode leaves
    var lcg = seed * 2654435761L + 12345L
    var i = 0
    while (i < noisePixels) {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      val px = ((lcg >>> 33) % w).toInt
      val py = ((lcg >>> 17) % h).toInt
      val delta = (((lcg >>> 45) % 49L) - 24L).toInt
      luma(py * w + px) =
        math.max(0, math.min(255, luma(py * w + px) + delta))
      i += 1
    }
    luma
  }

  /** Deterministic ANIMATED-GIF fixture: `nFrames` phase-shifted sinusoid
    * frames written through the JDK's own GIF sequence writer — a REAL
    * multi-frame video container the JDK can also decode, which upgrades
    * the video path from the byte-slicer stub to an actual
    * decode-frames-then-hash pipeline (q193). Frames are 8-bit indexed on
    * an exact 256-gray palette, so the GIF round-trips pixels losslessly.
    */
  def syntheticGif(seed: Int, nFrames: Int, w: Int = 64, h: Int = 64,
      brightness: Int = 0, noisePixels: Int = 0): Array[Byte] = {
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      writer.prepareWriteSequence(writer.getDefaultStreamMetadata(param))
      var f = 0
      while (f < nFrames) {
        val luma = renderLuma(seed, f, w, h, brightness, noisePixels)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, luma(y * w + x)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic 16-bit PCM WAV fixture (sine wave), encoded by the
    * JDK's own writer — the planted REAL-audio payload for pipelines over
    * corpora that carry no audio column (clearly a fixture: the decode
    * side is the real operator under test).
    */
  def syntheticWav(rate: Float, channels: Int, amp: Double, hz: Double,
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
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}

/** `sample_frames(payload, frameBytes, n) -> array<binary>`: n evenly
  * spaced frameBytes-sized slices of the payload (shorter tail slices kept;
  * empty payload -> empty array). Full codegen via a shared static-shaped
  * helper — one call per row, no UDF serialization.
  */
final case class SampleFrames(child: Expression, frameBytes: Int, n: Int)
  extends UnaryExpression {

  require(frameBytes > 0 && n > 0, "sample_frames: frameBytes>0, n>0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $dt")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "sample_frames"

  override def nullSafeEval(input: Any): Any =
    SampleFrames.compute(input.asInstanceOf[Array[Byte]], frameBytes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.SampleFrames$$.MODULE$$.compute($b, $frameBytes, $n);")

  override protected def withNewChildInternal(newChild: Expression): SampleFrames =
    copy(child = newChild)
}

/** `decode_image(payload, grid) -> struct<width int, height int,
  * format string, gray array<double>>` — NULL when the payload is not a
  * decodable image. `gray` is a grid×grid box-filtered luma map in [0, 1]
  * (BT.601 weights), row-major: the canonical small-feature input for
  * perceptual hashing / near-dup screens over image corpora.
  */
final case class DecodeImage(child: Expression, grid: Int) extends UnaryExpression {

  require(grid > 0 && grid <= 64, "decode_image: 1 <= grid <= 64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $dt")
  }
  override def dataType: DataType = DecodeImage.schema
  override def nullable: Boolean = true
  override def prettyName: String = "decode_image"

  override def nullSafeEval(input: Any): Any =
    DecodeImage.compute(input.asInstanceOf[Array[Byte]], grid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = ($javaType) graft.functions.DecodeImage$$.MODULE$$.compute(${c.value}, $grid);
          ${ev.isNull} = ${ev.value} == null;
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeImage =
    copy(child = newChild)
}

object DecodeImage {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("gray", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Decode via the JDK's ImageIO readers; null for non-images. The gray
    * grid is a plain box filter over getRGB pixels — no Graphics2D
    * interpolation, so values are identical on every JVM. Shared by
    * `decode_image` (surfaces the grid) and `phash64` (DCTs it).
    */
  // ImageIO's default stream cache is a TEMP FILE per createImageInputStream
  // call — at one decode per row that is an open file descriptor and a
  // /tmp inode per row, which exhausts ulimit under a 32-thread executor.
  // Payloads are already in-memory byte arrays: cache in memory.
  javax.imageio.ImageIO.setUseCache(false)

  private[functions] def decodeGray(
      payload: Array[Byte], grid: Int): (Int, Int, String, Array[Double]) = {
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val format = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        val img = reader.read(0)
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) return null
        val gray = new Array[Double](grid * grid)
        var gy = 0
        while (gy < grid) {
          val y0 = (h.toLong * gy / grid).toInt
          val y1 = math.max((h.toLong * (gy + 1) / grid).toInt, y0 + 1)
          var gx = 0
          while (gx < grid) {
            val x0 = (w.toLong * gx / grid).toInt
            val x1 = math.max((w.toLong * (gx + 1) / grid).toInt, x0 + 1)
            var sum = 0.0
            var y = y0
            while (y < math.min(y1, h)) {
              var x = x0
              while (x < math.min(x1, w)) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
                x += 1
              }
              y += 1
            }
            val cells = (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
            gray(gy * grid + gx) = if (cells > 0) sum / cells else 0.0
            gx += 1
          }
          gy += 1
        }
        (w, h, format, gray)
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => null }
    finally if (iis != null) iis.close()
  }

  def compute(payload: Array[Byte], grid: Int): org.apache.spark.sql.catalyst.InternalRow =
    decodeGray(payload, grid) match {
      case null => null
      case (w, h, format, gray) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
          w, h, org.apache.spark.unsafe.types.UTF8String.fromString(format),
          new GenericArrayData(gray)))
    }
}

/** `decode_audio(payload) -> struct<sample_rate int, channels int,
  * frames bigint, duration_ms double, rms double, peak double>` — NULL
  * when the payload is not decodable audio. REAL decode via the JDK's
  * `javax.sound.sampled` (WAV/AIFF/AU, any PCM width — no external codec
  * needed); `rms`/`peak` are computed over all samples normalized to
  * [-1, 1], the canonical small features for silence/clipping screens and
  * loudness bucketing over audio corpora.
  */
final case class DecodeAudio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $dt")
  }
  override def dataType: DataType = DecodeAudio.schema
  override def nullable: Boolean = true
  override def prettyName: String = "decode_audio"

  override def nullSafeEval(input: Any): Any =
    DecodeAudio.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = ($javaType) graft.functions.DecodeAudio$$.MODULE$$.compute(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeAudio =
    copy(child = newChild)
}

object DecodeAudio {
  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false)))

  /** Decode via the JDK's sampled-audio readers; null for non-audio. The
    * stream is converted to 16-bit signed PCM (the JDK converts any
    * PCM/ULAW/ALAW source), samples normalized to [-1, 1].
    */
  def compute(payload: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    // magic-bytes pre-screen: the JDK reader signals "not audio" by
    // EXCEPTION, and corpora are mostly non-audio — filling a stack trace
    // per row would dominate the scan. RIFF (WAV) / FORM (AIFF) / .snd (AU).
    if (payload.length < 12) return null
    val riff = payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F'
    val form = payload(0) == 'F' && payload(1) == 'O' && payload(2) == 'R' && payload(3) == 'M'
    val snd = payload(0) == '.' && payload(1) == 's' && payload(2) == 'n' && payload(3) == 'd'
    if (!riff && !form && !snd) return null
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(payload)))
      try {
        val src = in.getFormat
        val rate = src.getSampleRate
        val channels = src.getChannels
        if (rate <= 0 || channels <= 0) return null
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          rate, 16, channels, 2 * channels, rate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        try {
          val buf = new Array[Byte](8192)
          var sumSq = 0.0
          var peak = 0.0
          var nSamples = 0L
          var n = pcm.read(buf)
          while (n > 0) {
            var i = 0
            while (i + 1 < n) {
              // little-endian signed 16-bit
              val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort / 32768.0
              sumSq += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              nSamples += 1
              i += 2
            }
            n = pcm.read(buf)
          }
          if (nSamples == 0) return null
          val frames = nSamples / channels
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
            rate.toInt, channels, frames,
            frames * 1000.0 / rate,
            math.sqrt(sumSq / nSamples), peak))
        } finally pcm.close()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}

/** `video_frames(payload, n) -> array<binary>`: n evenly spaced DECODED
  * frames (PNG-re-encoded) of a multi-frame image container — the real
  * upgrade over `sample_frames`' byte slicer for the one video format the
  * JDK ships a codec for (animated GIF). Evaluation is one shared static
  * helper (interpreted ≡ generated); NULL when no ImageIO reader accepts
  * the payload.
  */
final case class VideoFrames(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "video_frames: n>0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $dt")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "video_frames"

  override def nullSafeEval(input: Any): Any =
    VideoFrames.compute(input.asInstanceOf[Array[Byte]], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |${ev.value} = graft.functions.VideoFrames$$.MODULE$$.compute($b, $n);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): VideoFrames =
    copy(child = newChild)
}

object VideoFrames {

  /** (left, top, disposal) of GIF frame `i`; defaults when the reader
    * exposes no GIF image metadata.
    */
  private def gifFrameMeta(reader: javax.imageio.ImageReader, i: Int): (Int, Int, String) =
    try {
      val tree = reader.getImageMetadata(i)
        .getAsTree("javax_imageio_gif_image_1.0").asInstanceOf[org.w3c.dom.Element]
      def attr(tag: String, name: String, dflt: String): String = {
        val nodes = tree.getElementsByTagName(tag)
        if (nodes.getLength == 0) dflt
        else Option(nodes.item(0).getAttributes.getNamedItem(name))
          .map(_.getNodeValue).getOrElse(dflt)
      }
      (attr("ImageDescriptor", "imageLeftPosition", "0").toInt,
        attr("ImageDescriptor", "imageTopPosition", "0").toInt,
        attr("GraphicControlExtension", "disposalMethod", "none"))
    } catch { case _: Exception => (0, 0, "none") }

  /** Shared by interpreted and generated code — identical by construction.
    * Decodes up to `n` evenly spaced frame ordinals over [0, total-1] and
    * re-encodes each as PNG. GIF frames are COMPOSITED: real-world
    * animated GIFs store optimized delta frames (a sub-rectangle at an
    * offset, disposal "do not dispose"), so each raster is drawn onto a
    * running logical-screen canvas at its recorded position, honoring the
    * disposal method, and the SAMPLED output is the composed canvas —
    * never a raw patch. Sampling the k-th ordinal therefore decodes
    * frames 0..k sequentially (the price of delta encoding; GIF has no
    * keyframe index to seek to).
    */
  def compute(payload: Array[Byte], n: Int): GenericArrayData = {
    import java.awt.image.BufferedImage
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val total = reader.getNumImages(true)
        if (total <= 0) return null
        val count = math.min(n, total)
        // "seek to timestamp i/n": even spacing over frame ordinals
        val targets = Array.tabulate(count)(i =>
          ((total - 1).toLong * i / math.max(count - 1, 1)).toInt)
        val frames = new Array[Any](count)
        def png(img: BufferedImage): Array[Byte] = {
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        if (!"gif".equalsIgnoreCase(reader.getFormatName)) {
          // single-raster-per-frame containers: direct reads
          var i = 0
          while (i < count) { frames(i) = png(reader.read(targets(i))); i += 1 }
        } else {
          val first = reader.read(0)
          var canvas = new BufferedImage(
            first.getWidth, first.getHeight, BufferedImage.TYPE_INT_ARGB)
          var out = 0
          var i = 0
          val maxIdx = targets(count - 1)
          while (i <= maxIdx) {
            val img = if (i == 0) first else reader.read(i)
            val (x, y, disposal) = gifFrameMeta(reader, i)
            // frames can extend the logical screen (defensive: malformed
            // descriptors) — grow the canvas rather than clip
            if (x + img.getWidth > canvas.getWidth || y + img.getHeight > canvas.getHeight) {
              val grown = new BufferedImage(
                math.max(canvas.getWidth, x + img.getWidth),
                math.max(canvas.getHeight, y + img.getHeight),
                BufferedImage.TYPE_INT_ARGB)
              val gg = grown.createGraphics(); gg.drawImage(canvas, 0, 0, null); gg.dispose()
              canvas = grown
            }
            val prev =
              if (disposal == "restoreToPrevious") {
                val c = new BufferedImage(canvas.getWidth, canvas.getHeight,
                  BufferedImage.TYPE_INT_ARGB)
                val gc = c.createGraphics(); gc.drawImage(canvas, 0, 0, null); gc.dispose()
                c
              } else null
            val g = canvas.createGraphics()
            g.drawImage(img, x, y, null)
            g.dispose()
            while (out < count && targets(out) == i) { frames(out) = png(canvas); out += 1 }
            disposal match {
              case "restoreToBackgroundColor" =>
                val g2 = canvas.createGraphics()
                g2.setComposite(java.awt.AlphaComposite.Clear)
                g2.fillRect(x, y, img.getWidth, img.getHeight)
                g2.dispose()
              case "restoreToPrevious" if prev != null => canvas = prev
              case _ => ()
            }
            i += 1
          }
        }
        new GenericArrayData(frames)
      } finally reader.dispose()
    } catch {
      case _: Exception => null // torn/corrupt container: NULL, never throw
    } finally iis.close()
  }
}

object SampleFrames {
  /** Shared by interpreted and generated code — identical by construction. */
  def compute(payload: Array[Byte], frameBytes: Int, n: Int): GenericArrayData = {
    if (payload.isEmpty) return new GenericArrayData(Array.empty[Any])
    val frames = new Array[Any](math.min(n, math.max(1, payload.length / math.max(frameBytes, 1))))
    val count = frames.length
    var i = 0
    while (i < count) {
      // evenly spaced offsets across the payload ("seek to timestamp i/n")
      val off = ((payload.length - math.min(frameBytes, payload.length)).toLong * i /
        math.max(count - 1, 1)).toInt
      val len = math.min(frameBytes, payload.length - off)
      frames(i) = java.util.Arrays.copyOfRange(payload, off, off + len)
      i += 1
    }
    new GenericArrayData(frames)
  }
}
