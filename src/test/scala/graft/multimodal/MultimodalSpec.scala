package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "image", Array.tabulate(400)(_.toByte)),
    (2L, "audio", Array.tabulate(100)(i => (i * 3).toByte)),
    (3L, "video", null.asInstanceOf[Array[Byte]]),
    (4L, "image", Array.empty[Byte])).toDF("media_id", "kind", "bytes")

  test("withFeatures: typed features, nulls and empties survive") {
    val out = Multimodal.withFeatures(media, "bytes", "kind")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("n_bytes"), r.getAs[Int]("width"), r.getAs[Long]("checksum"))).toMap
    assert(out(1)._1 == 400 && out(1)._2 == 400 % 640)
    assert(out(3) == ((0, 0, 0L))) // null payload -> zero features, no NPE
    assert(out(4) == ((0, 0, 0L)))
    assert(out(1)._3 != out(2)._3) // checksums discriminate payloads
  }

  test("ImageIoCodec decodes a real PNG: raster dims + closed-form checksum") {
    val (seed, w, h) = (42L, 20, 13)
    val png = Multimodal.syntheticPng(seed, w, h)
    // PNG magic: this is a real encoded image, not arithmetic on text bytes
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val f = Multimodal.ImageIoCodec.decode("image", png)
    assert(f.width == w && f.height == h && f.n_bytes == png.length)
    val expected = (for { y <- 0 until h; x <- 0 until w }
      yield (x * 31 + y * 17 + seed) % 256).sum
    assert(f.checksum == expected)
  }

  test("ImageIoCodec decodes BMP too (second lossless container)") {
    val img = new java.awt.image.BufferedImage(
      7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for { y <- 0 until 5; x <- 0 until 7 } img.setRGB(x, y, (x + y * 7) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val f = Multimodal.ImageIoCodec.decode("image", bos.toByteArray)
    assert(f.width == 7 && f.height == 5)
    assert(f.checksum == (0 until 35).map(_ % 256).sum)
  }

  test("ImageIoCodec fails loudly on an undecodable payload") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode("image", Array.tabulate(64)(_.toByte))
    }
  }

  test("WavCodec decodes a real WAV: format fields + closed-form sample sum") {
    val (seed, rate, frames) = (42L, 16000, 120)
    val wav = Multimodal.syntheticWav(seed, rate, frames)
    // RIFF/WAVE magic: a real container, not arithmetic on raw bytes
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
    val f = Multimodal.WavCodec.decode("audio", wav)
    assert(f.sample_rate == rate && f.n_frames == frames && f.n_bytes == wav.length)
    assert(f.width == 0 && f.height == 0)
    val expected = (0 until frames).map(i => ((i * 13L + seed * 7L) % 4096L) - 2048L).sum
    assert(f.checksum == expected)
  }

  test("WavCodec fails loudly on an undecodable payload") {
    intercept[Exception] {
      Multimodal.WavCodec.decode("audio", Array.tabulate(64)(_.toByte))
    }
  }

  test("KindDispatchCodec: image, audio AND video all decode for real") {
    val png = Multimodal.syntheticPng(7L, 10, 10)
    assert(Multimodal.KindDispatchCodec.decode("image", png) ==
      Multimodal.ImageIoCodec.decode("image", png))
    val wav = Multimodal.syntheticWav(7L, 8000, 50)
    assert(Multimodal.KindDispatchCodec.decode("audio", wav) ==
      Multimodal.WavCodec.decode("audio", wav))
    val gif = Multimodal.syntheticGif(7L, 8, 6, 4)
    assert(Multimodal.KindDispatchCodec.decode("video", gif) ==
      Multimodal.GifVideoCodec.decode("video", gif))
    assert(Multimodal.GifVideoCodec.decode("video", gif).n_frames == 4)
  }

  test("GifVideoCodec decodes a real animated GIF: frame count, dims, checksum") {
    val (seed, w, h, nf) = (42L, 12, 9, 5)
    val gif = Multimodal.syntheticGif(seed, w, h, nf)
    // GIF89a magic: a real multi-frame container, not arithmetic on bytes
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F' && gif(3) == '8')
    val f = Multimodal.GifVideoCodec.decode("video", gif)
    assert(f.width == w && f.height == h && f.n_frames == nf && f.n_bytes == gif.length)
    assert(f.sample_rate == 0)
    val expected = (for { fr <- 0 until nf; y <- 0 until h; x <- 0 until w }
      yield (x * 31 + y * 17 + fr * 11 + seed) % 256).sum
    assert(f.checksum == expected)
  }

  test("GifVideoCodec fails loudly on an undecodable video payload") {
    intercept[IllegalArgumentException] {
      Multimodal.GifVideoCodec.decode("video", Array.tabulate(100)(_.toByte))
    }
  }

  test("decimateGifFrames: real temporal downsample keeps the closed form") {
    val (seed, w, h, nf) = (11L, 10, 7, 7)
    val small = Multimodal.decimateGifFrames(Multimodal.syntheticGif(seed, w, h, nf), 2)
    val f = Multimodal.GifVideoCodec.decode("video", small)
    assert(f.width == w && f.height == h && f.n_frames == (nf + 1) / 2)
    val expected = (for { j <- 0 until (nf + 1) / 2; y <- 0 until h; x <- 0 until w }
      yield (x * 31 + y * 17 + (2 * j) * 11 + seed) % 256).sum
    assert(f.checksum == expected)
  }

  test("sampleVideoFrames: real per-frame decode, every k-th frame, capped") {
    import spark.implicits._
    val (seed, w, h, nf) = (3L, 6, 5, 11)
    val rows = Seq((1L, Multimodal.syntheticGif(seed, w, h, nf)),
      (2L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "bytes")
    val out = Multimodal.sampleVideoFrames(rows, "bytes", everyK = 4, maxFrames = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // frames 0 and 4 of 11 (cap 2 wins over ceil(11/4)=3)
    assert(out(1L).getAs[Int]("n_sampled") == 2)
    val frameSum = (fr: Int) => (for { y <- 0 until h; x <- 0 until w }
      yield (x * 31 + y * 17 + fr * 11 + seed) % 256).sum.toLong
    assert(out(1L).getSeq[Long](out(1L).fieldIndex("frame_sums")) ==
      Seq(frameSum(0), frameSum(4)))
    assert(out(2L).getAs[Int]("n_sampled") == 0) // null payload -> zero frames
  }

  test("withFeatures end-to-end with the real codec: decoded dims per row") {
    import spark.implicits._
    val rows = Seq((1L, "image", Multimodal.syntheticPng(1L, 9, 4)),
      (2L, "image", Multimodal.syntheticPng(2L, 30, 22)))
      .toDF("media_id", "kind", "bytes")
    val out = Multimodal.withFeatures(rows, "bytes", "kind", Multimodal.ImageIoCodec)
      .select("media_id", "width", "height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((9, 4)) && out(2L) == ((30, 22)))
  }

  test("resizePngNN: real raster downscale, closed form survives the round trip") {
    val (seed, w, h) = (11L, 21, 14)
    val small = Multimodal.resizePngNN(Multimodal.syntheticPng(seed, w, h), 2)
    val f = Multimodal.ImageIoCodec.decode("image", small)
    assert(f.width == w / 2 && f.height == h / 2)
    val expected = (for { y <- 0 until h / 2; x <- 0 until w / 2 }
      yield ((2 * x) * 31 + (2 * y) * 17 + seed) % 256).sum
    assert(f.checksum == expected)
  }

  test("resampleWavNN: frame decimation halves rate and keeps the closed form") {
    val (seed, rate, frames) = (11L, 16000, 121)
    val small = Multimodal.resampleWavNN(Multimodal.syntheticWav(seed, rate, frames), 2)
    val f = Multimodal.WavCodec.decode("audio", small)
    val outN = (frames + 1) / 2
    assert(f.sample_rate == rate / 2 && f.n_frames == outN)
    val expected = (0 until outN)
      .map(i => ((2L * i * 13L + seed * 7L) % 4096L) - 2048L).sum
    assert(f.checksum == expected)
  }

  test("withDownscaled routes all three real kinds; unknown kinds pass through") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image", Multimodal.syntheticPng(1L, 10, 8)),
      (2L, "audio", Multimodal.syntheticWav(2L, 8000, 40)),
      (3L, "video", Multimodal.syntheticGif(3L, 6, 4, 9)),
      (4L, "text", Array.tabulate(64)(_.toByte)))
      .toDF("media_id", "kind", "bytes")
    val out = Multimodal.withDownscaled(rows, "bytes", "kind", factor = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes_small")).toMap
    assert(Multimodal.ImageIoCodec.decode("image", out(1L)).width == 5)
    assert(Multimodal.WavCodec.decode("audio", out(2L)).n_frames == 20)
    assert(Multimodal.GifVideoCodec.decode("video", out(3L)).n_frames == 5)
    assert(out(4L).toSeq == Array.tabulate(64)(_.toByte).toSeq) // passthrough
  }

  test("sampleFrames: every k-th 16-byte slice, bounded by maxFrames and length") {
    val out = Multimodal.sampleFrames(media, "bytes", everyK = 2, maxFrames = 5)
      .select("media_id", "n_sampled", "frames")
      .collect().map(r => r.getLong(0) -> r).toMap
    // media 1: offsets 0,32,64,96,128 all < 400 -> 5 frames of 16 bytes
    assert(out(1L).getAs[Int]("n_sampled") == 5)
    assert(out(1L).getSeq[Array[Byte]](2).forall(_.length == 16))
    // media 2 (100 bytes): offsets 0,32,64,96 -> 4 frames, last one short
    assert(out(2L).getAs[Int]("n_sampled") == 4)
    assert(out(2L).getSeq[Array[Byte]](2).last.length == 4)
    // null payload -> zero frames
    assert(out(3L).getAs[Int]("n_sampled") == 0)
  }
}
