package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Multimodal, VideoFrames}
import graft.queries.VideoQueries

/** The REAL video path (r12): JDK-written animated GIFs decoded frame by
  * frame through `video_frames`. Pins (a) the frozen (video, frame) pHash
  * literals ≡ live decode — the q92 discipline that makes q193's oracle a
  * decoder-drift tripwire; (b) container mechanics (frame count, even
  * sampling, lossless gray round-trip); (c) NULL on undecodable payloads.
  */
class VideoSpec extends AnyFunSuite {
  import TestSpark._

  test("frozen literals == live decode+hash for every (video, sampled frame)") {
    val planted = spark.createDataFrame(
      VideoQueries.videoFixtureIds.map(id => (id, VideoQueries.videoFixturePayload(id))))
      .toDF("vid", "payload")
    val live = planted
      .select(col("vid"),
        posexplode(Multimodal.videoFrames(col("payload"), 4)).as(Seq("pos", "frame")))
      .select(col("vid"), col("pos"), Multimodal.phash64(col("frame")).as("ph"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(live == VideoQueries.videoPhashLiterals.sorted,
      "frozen video pHash literals drifted from the live GIF decode + DCT")
  }

  test("gif round-trip: 8 frames written, evenly sampled, gray pixels lossless") {
    val gif = Multimodal.syntheticGif(3, 8)
    val all = VideoFrames.compute(gif, 8)
    assert(all.numElements() == 8, "all frames decodable")
    val sampled = VideoFrames.compute(gif, 4)
    assert(sampled.numElements() == 4)
    // sampled = evenly spaced subset of all (idx 0, 2, 4, 7)
    val allB = (0 until 8).map(all.getBinary)
    val samB = (0 until 4).map(sampled.getBinary)
    assert(Seq(0, 2, 4, 7).map(allB).zip(samB)
      .forall { case (a, b) => java.util.Arrays.equals(a, b) })
    // frames genuinely differ (the phase shift is real motion)
    assert(allB.map(_.toSeq).distinct.size == 8)
    // asking for more frames than exist returns what exists
    assert(VideoFrames.compute(gif, 99).numElements() == 8)
  }

  test("a single-frame image is a 1-frame video; junk payloads are NULL") {
    val png = Multimodal.syntheticPng(1)
    val one = VideoFrames.compute(png, 4)
    assert(one.numElements() == 1)
    assert(VideoFrames.compute("not a video".getBytes("UTF-8"), 4) == null)
    assert(VideoFrames.compute(Array.empty[Byte], 4) == null)
    // and through the SQL surface over a corpus of undecodable payloads
    val n = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(Multimodal.videoFrames(encode(col("text"), "UTF-8"), 4)))
      .count()
    assert(n == 0, "text payloads must decode to nothing, not throw")
  }

  test("q193 finds exactly the planted (base, re-encode) video pairs") {
    val rows = SparkEntry.queries("q193_video_frame_neardup")(spark, sf).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((0L, 100L), (1L, 101L), (2L, 102L)),
      s"expected the three planted re-encode pairs, got ${pairs.mkString(", ")}")
    assert(rows.forall(_.getAs[Int]("min_hamming") == 0))
    assert(rows.forall(_.getAs[Long]("n_close_frames") >= 4L))
  }

  test("optimized delta GIFs composite: offset patches land on the running canvas") {
    // hand-write a 2-frame GIF whose second frame is a 4x4 patch at (6,6)
    // (disposal none) — the common optimized-encoder output. video_frames
    // must emit the COMPOSED 16x16 canvas, not the raw 4x4 patch.
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    def frame(w: Int, h: Int, v: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, v)
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    writer.setOutput(ios)
    writer.prepareWriteSequence(writer.getDefaultStreamMetadata(param))
    writer.writeToSequence(new javax.imageio.IIOImage(frame(16, 16, 40), null, null), param)
    // second frame: patch with an ImageDescriptor offset of (6,6)
    val patch = frame(4, 4, 200)
    val spec = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(patch)
    val md = writer.getDefaultImageMetadata(spec, param)
    val fmt = "javax_imageio_gif_image_1.0"
    val tree = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val kids = tree.getElementsByTagName("ImageDescriptor")
    val desc = kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    desc.setAttribute("imageLeftPosition", "6")
    desc.setAttribute("imageTopPosition", "6")
    md.setFromTree(fmt, tree)
    writer.writeToSequence(new javax.imageio.IIOImage(patch, null, md), param)
    writer.endWriteSequence()
    writer.dispose(); ios.close()

    val payload = bos.toByteArray
    // ground truth straight from the container (the JDK writer may remap
    // palettes; composition correctness is about PLACEMENT, not palette)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    val bgRgb = reader.read(0).getRGB(0, 0)
    val patchRgb = reader.read(1).getRGB(0, 0)
    reader.dispose(); iis.close()
    assert(bgRgb != patchRgb, "fixture must be distinguishable")

    val frames = VideoFrames.compute(payload, 2)
    assert(frames.numElements() == 2)
    val second = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames.getBinary(1)))
    assert(second.getWidth == 16 && second.getHeight == 16,
      s"must be the composed canvas, not the raw patch: ${second.getWidth}x${second.getHeight}")
    assert(second.getRGB(7, 7) == patchRgb,
      s"patch pixel at its offset: ${Integer.toHexString(second.getRGB(7, 7))}")
    assert(second.getRGB(0, 0) == bgRgb,
      s"background pixel must survive from frame 0: ${Integer.toHexString(second.getRGB(0, 0))}")
  }
}
