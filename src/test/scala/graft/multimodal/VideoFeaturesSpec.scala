package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class VideoFeaturesSpec extends AnyFunSuite with SparkSuite {

  /** Identity-palette GIF whose frame f is a CONSTANT gray level(f). */
  private def flatClip(levels: Seq[Int], w: Int = 8, h: Int = 6): Array[Byte] = {
    val cm = {
      val g = (0 until 256).map(_.toByte).toArray
      new java.awt.image.IndexColorModel(8, 256, g, g, g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val iis = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(iis)
    writer.prepareWriteSequence(null)
    levels.foreach { lvl =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      (0 until h).foreach(y => (0 until w).foreach(x => raster.setSample(x, y, 0, lvl)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); iis.close()
    bos.toByteArray
  }

  test("a static clip has zero deltas; a hard cut spikes exactly") {
    // frames: 10, 10, 200, 200 -> deltas 0, 190*w*h, 0
    val clip = flatClip(Seq(10, 10, 200, 200))
    val deltas = VideoFeatures.frameDeltas(clip)
    assert(deltas == Seq((1, 0L), (2, 190L * 8 * 6), (3, 0L)))
  }

  test("deltas match the generator's closed form on a synthetic clip") {
    val clip = Multimodal.syntheticGif(seed = 5, w = 7, h = 5, nFrames = 4)
    val got = VideoFeatures.frameDeltas(clip)
    val want = (1 until 4).map { f =>
      var d = 0L
      for (y <- 0 until 5; x <- 0 until 7) {
        val a = (x * 31 + y * 17 + f * 11 + 5) % 256
        val b = (x * 31 + y * 17 + (f - 1) * 11 + 5) % 256
        d += math.abs(a - b)
      }
      (f, d)
    }
    assert(got == want)
  }

  test("withFrameDeltas explodes n_frames - 1 rows per clip") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticGif(1, 6, 4, 5)),
      (2L, Multimodal.syntheticGif(2, 6, 4, 2))).toDF("id", "bytes")
    val counts = VideoFeatures.withFrameDeltas(df, "bytes")
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 4L, 2L -> 1L))
  }

  test("undecodable payloads fail loudly") {
    intercept[Exception] {
      VideoFeatures.frameDeltas(Array[Byte](1, 2, 3, 4))
    }
  }
}
