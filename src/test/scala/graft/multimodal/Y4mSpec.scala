package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Proof obligations for the pure-JDK YUV4MPEG2 decoder: header
  * parsing across colorspaces, lossless luma round-trip against the
  * closed form, exact chroma skipping (the framing property the gates
  * lean on), FRAME-parameter tolerance, and the loud refusals. */
class Y4mSpec extends AnyFunSuite {

  private def luma(seed: Long, w: Int, h: Int, f: Int): Array[Int] =
    Array.tabulate(w * h)(i =>
      (((i % w) * 31 + (i / w) * 17 + f * 11 + seed) % 256 + 256).toInt % 256)

  test("luma round-trips the closed form across 420/422/444/mono") {
    for (cs <- Seq("420jpeg", "422", "444", "mono")) {
      val bytes = Y4m.synthetic(7L, 8, 6, 3, colorspace = cs)
      val frames = Y4m.lumaFrames(bytes).toSeq
      assert(frames.length == 3, cs)
      for (f <- 0 until 3)
        assert(frames(f).toSeq == luma(7L, 8, 6, f).toSeq, s"$cs frame $f")
      assert(Y4m.frameCount(bytes) == 3)
    }
  }

  test("header parses dims, colorspace, and ignores F/I/A/X tags") {
    val bytes = Y4m.synthetic(1L, 10, 4, 1)
    val hd = Y4m.parseHeader(bytes)
    assert(hd.w == 10 && hd.h == 4 && hd.colorspace == "420jpeg")
    assert(hd.ySize == 40 && hd.chromaSize == 10)
    // hand-built header with extension tag and FRAME params
    val y = Array.fill[Byte](4)(9)
    val raw = ("YUV4MPEG2 W2 H2 F30000:1001 It A0:0 Cmono XYSCSS=1\n" +
      "FRAME Ixyz\n").getBytes("US-ASCII") ++ y
    val fr = Y4m.lumaFrames(raw).toSeq
    assert(fr.length == 1 && fr.head.toSeq == Seq(9, 9, 9, 9))
  }

  test("a mis-sized payload refuses loudly instead of desynchronizing") {
    val good = Y4m.synthetic(3L, 4, 4, 2)
    val truncated = good.take(good.length - 5)
    val ex = intercept[IllegalArgumentException] {
      Y4m.lumaFrames(truncated).toSeq
    }
    assert(ex.getMessage.contains("truncated"), ex.getMessage)
    assert(intercept[IllegalArgumentException] {
      Y4m.parseHeader("JUNKMAGIC blah\n".getBytes("US-ASCII"))
    }.getMessage.contains("magic"))
    assert(intercept[RuntimeException] {
      Y4m.parseHeader("YUV4MPEG2 W4 H4 C999\n".getBytes("US-ASCII"))
    }.getMessage.contains("unsupported"))
    assert(intercept[IllegalArgumentException] {
      Y4m.parseHeader("YUV4MPEG2 W5 H4 C420\n".getBytes("US-ASCII"))
    }.getMessage.contains("even"))
  }

  test("VideoFeatures dispatches by magic: Y4M deltas equal the GIF path's") {
    // same luma closed form in both containers -> identical deltas
    val gif = Multimodal.syntheticGif(11L, 8, 6, 4)
    val y4m = Y4m.synthetic(11L, 8, 6, 4)
    assert(VideoFeatures.frameDeltas(y4m) == VideoFeatures.frameDeltas(gif))
  }

  test("chroma planes are skipped exactly (4:2:0 vs mono agree on luma)") {
    val a = Y4m.lumaFrames(Y4m.synthetic(5L, 6, 4, 3, "420jpeg")).toSeq
    val b = Y4m.lumaFrames(Y4m.synthetic(5L, 6, 4, 3, "mono")).toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("GifVideoCodec reads Y4M: dims, frame count, luma checksum") {
    val bytes = Y4m.synthetic(9L, 6, 4, 3)
    val mf = Multimodal.GifVideoCodec.decode("video", bytes)
    val expected = (0 until 3).map(f => luma(9L, 6, 4, f).map(_.toLong).sum).sum
    assert(mf.width == 6 && mf.height == 4 && mf.n_frames == 3)
    assert(mf.checksum == expected)
  }
}
