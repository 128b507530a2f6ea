package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Proof obligations for the RIFF/AVI decoder: exact closed-form decode
  * on the lossless BI_RGB path (bottom-up flip + stride padding both
  * load-bearing), bounded decode noise + robust cut detection on the
  * real MJPEG path, framing refusals, and the container sniff. */
class AviSpec extends AnyFunSuite {

  private def expected(seed: Long, w: Int, h: Int, f: Int): Array[Int] =
    Array.tabulate(h * w) { i =>
      val y = i / w; val x = i % w
      (((x * 31 + y * 17 + f * 11 + seed) % 256 + 256) % 256).toInt
    }

  test("BI_RGB decode is bit-exact against the closed form (stride-padded width)") {
    // w = 5: row stride 15 -> padded to 16, exercising the 4-byte pad
    val bytes = Avi.syntheticDib(seed = 9L, w = 5, h = 4, nFrames = 3)
    assert(Avi.isAvi(bytes))
    val fmt = Avi.parseFormat(bytes)
    assert(fmt.width == 5 && fmt.height == 4 &&
      fmt.compression == "BI_RGB" && fmt.bitCount == 24)
    assert(Avi.frameCount(bytes) == 3)
    val frames = Avi.grayFrames(bytes).toSeq
    assert(frames.length == 3)
    for (f <- 0 until 3)
      assert(frames(f).toSeq == expected(9L, 5, 4, f).toSeq, s"frame $f")
  }

  test("frameDeltas over a DIB AVI match the closed form exactly") {
    val bytes = Avi.syntheticDib(seed = 4L, w = 6, h = 4, nFrames = 4)
    val deltas = VideoFeatures.frameDeltas(bytes)
    val want = (1 until 4).map { f =>
      val a = expected(4L, 6, 4, f - 1); val b = expected(4L, 6, 4, f)
      (f, a.indices.map(i => math.abs(b(i) - a(i)).toLong).sum)
    }
    assert(deltas == want)
  }

  test("MJPEG frames decode within a few gray levels of their uniform input") {
    val bytes = Avi.syntheticMjpeg(seed = 2L, w = 16, h = 16, nFrames = 6,
      cutEvery = 3, low = 64, high = 192)
    assert(Avi.frameCount(bytes) == 6)
    val frames = Avi.grayFrames(bytes).toSeq
    assert(frames.length == 6)
    for ((fr, f) <- frames.zipWithIndex) {
      val wantG = if (f % 3 == 2) 192 else 64 // seed 2 % cutEvery 3 = 2
      val mean = fr.sum.toDouble / fr.length
      assert(math.abs(mean - wantG) < 4.0,
        s"frame $f mean $mean vs uniform input $wantG")
    }
  }

  test("planted cuts spike the delta track robustly (threshold mid-gap)") {
    val w = 12; val h = 10
    val bytes = Avi.syntheticMjpeg(seed = 1L, w = w, h = h, nFrames = 9,
      cutEvery = 4, low = 64, high = 192)
    val deltas = VideoFeatures.frameDeltas(bytes)
    assert(deltas.length == 8)
    val thresh = w.toLong * h * 64 // half the 128 gap
    // seed 1 % 4 = 1: high frames at 1, 5 -> cut deltas at idx 1,2,5,6
    val cuts = deltas.filter(_._2 > thresh).map(_._1)
    assert(cuts == Seq(1, 2, 5, 6), s"deltas: $deltas")
  }

  test("sampling decodes only every k-th frame and sums match") {
    // exercised at gate level too; here just the chunk-indexed path
    val bytes = Avi.syntheticDib(seed = 7L, w = 4, h = 4, nFrames = 10)
    val fmt = Avi.parseFormat(bytes)
    val chunks = Avi.frameChunks(bytes)
    val sums = chunks.indices.by(4).take(3).map { i =>
      Avi.grayFrameAt(bytes, chunks(i), fmt).map(_.toLong).sum
    }
    val want = Seq(0, 4, 8).map(f => expected(7L, 4, 4, f).map(_.toLong).sum)
    assert(sums == want)
  }

  test("refusals: bad magic, truncated chunk, missing strf") {
    assert(!Avi.isAvi("nope".getBytes))
    val ok = Avi.syntheticDib(3L, 4, 4, 2)
    val truncated = ok.take(ok.length - 10)
    assert(intercept[Exception](Avi.grayFrames(truncated).toSeq)
      .getMessage.toLowerCase.contains("overrun"))
    // RIFF/AVI shell with no streams at all
    val empty = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("RIFF".getBytes); bos.write(Array[Byte](4, 0, 0, 0))
      bos.write("AVI ".getBytes)
      bos.toByteArray
    }
    assert(intercept[Exception](Avi.parseFormat(empty))
      .getMessage.contains("strf"))
  }

  // -- hand-built RIFF shells for the strl-boundary state machine --

  private def le32(v: Long): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def rchunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(id.getBytes("US-ASCII")); bos.write(le32(body.length.toLong))
    bos.write(body)
    if ((body.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  private def rlist(tp: String, kids: Seq[Array[Byte]]): Array[Byte] =
    rchunk("LIST", tp.getBytes("US-ASCII") ++ kids.flatten)

  private def riff(kids: Array[Byte]*): Array[Byte] =
    rchunk("RIFF", "AVI ".getBytes("US-ASCII") ++ kids.toSeq.flatten)

  /** 40-byte WAVEFORMATEX-ish strf: 44100/176400 land exactly where a
    * BITMAPINFOHEADER keeps width/height. */
  private val waveStrf: Array[Byte] =
    le32(40L) ++ le32(44100L) ++ le32(176400L) ++ Array.fill(28)(0: Byte)

  private val videoStrl: Array[Byte] = rlist("strl", Seq(
    rchunk("strh", "vids".getBytes("US-ASCII") ++ Array.fill(36)(0: Byte)),
    rchunk("strf", le32(40L) ++ le32(6L) ++ le32(4L) ++
      Array[Byte](1, 0, 24, 0) ++ le32(0L) ++ Array.fill(20)(0: Byte))))

  test("a TRUNCATED strh never inherits the previous strl's 'vids'") {
    // video strl (vids strh, NO strf) then an audio strl whose strh is
    // 2 bytes: before the boundary reset, the audio WAVEFORMATEX was
    // parsed as a BITMAPINFOHEADER (width 44100) — now it must refuse
    val videoNoStrf = rlist("strl", Seq(
      rchunk("strh", "vids".getBytes("US-ASCII") ++ Array.fill(36)(0: Byte))))
    val audioTruncStrh = rlist("strl", Seq(
      rchunk("strh", Array[Byte](1, 2)), rchunk("strf", waveStrf)))
    val bytes = riff(rlist("hdrl", Seq(videoNoStrf, audioTruncStrh)))
    assert(Avi.isAvi(bytes))
    assert(intercept[Exception](Avi.parseFormat(bytes))
      .getMessage.contains("strf"))
  }

  test("audio-first layouts still resolve the real video format") {
    val audioTruncStrh = rlist("strl", Seq(
      rchunk("strh", Array[Byte](1, 2)), rchunk("strf", waveStrf)))
    val audioFull = rlist("strl", Seq(
      rchunk("strh", "auds".getBytes("US-ASCII") ++ Array.fill(36)(0: Byte)),
      rchunk("strf", waveStrf)))
    for (audio <- Seq(audioTruncStrh, audioFull)) {
      val bytes = riff(rlist("hdrl", Seq(audio, videoStrl)))
      val fmt = Avi.parseFormat(bytes)
      assert(fmt.width == 6 && fmt.height == 4 && fmt.compression == "BI_RGB")
    }
  }
}
