package graft.multimodal

/** Pure-JDK decoder for YUV4MPEG2 (`.y4m`) — a REAL, published video
  * container (the mjpegtools/ffmpeg interchange format: an ASCII
  * stream header, then `FRAME`-delimited raw planar YUV). This closes
  * the multimodal family's last honesty gap: the video path previously
  * decoded only multi-frame animated GIF (the one container ImageIO
  * parses); compressed containers (mp4/h264) need native codecs the
  * sandbox lacks, but Y4M is UNCOMPRESSED — framing is the whole
  * format — so a dependency-free decoder covers a true video container
  * end to end.
  *
  * Format (public spec, e.g. the mjpegtools y4m manpage):
  * {{{
  * YUV4MPEG2 W<w> H<h> F<n:d> I<p> A<n:d> C<space> [X...]\n
  * FRAME [params]\n  <Y plane: w*h bytes> <U plane> <V plane>
  * FRAME [params]\n  ...
  * }}}
  * Supported colorspaces: C420 / C420jpeg / C420mpeg2 / C420paldv
  * (chroma planes (w/2)·(h/2) each — the subsampling VARIANTS differ
  * only in chroma siting, which never changes plane sizes), C422
  * ((w/2)·h), C444 (w·h), Cmono (no chroma). Luma is what every
  * grayscale feature reads; chroma is parsed (sized and skipped) so
  * framing errors fail loudly instead of smearing into the next frame.
  *
  * Scale shape: an iterator over frames — one Y plane in memory at a
  * time, never the clip; callers fold per-frame features and drop the
  * raster (the [[VideoFeatures]] two-frame window).
  */
object Y4m {

  private val Magic = "YUV4MPEG2 ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Container sniff: Y4M payloads start with the ASCII magic. */
  def isY4m(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= Magic.length &&
      java.util.Arrays.equals(bytes, 0, Magic.length, Magic, 0, Magic.length)

  final case class Header(w: Int, h: Int, colorspace: String,
                          headerEnd: Int, ySize: Int, chromaSize: Int)

  /** Parse the stream header; refuses unknown colorspaces and odd
    * dimensions under 4:2:0/4:2:2 loudly (a silently mis-sized chroma
    * plane would desynchronize every later frame). */
  def parseHeader(bytes: Array[Byte]): Header = {
    require(isY4m(bytes), "not a YUV4MPEG2 payload (bad magic)")
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "YUV4MPEG2 header has no terminating newline")
    val header = new String(bytes, 0, nl, java.nio.charset.StandardCharsets.US_ASCII)
    val tags = header.split(' ').drop(1).filter(_.nonEmpty)
    var w = -1; var h = -1; var cs = "420jpeg" // spec default = 4:2:0
    tags.foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'C' => cs = t.substring(1)
        case _ => () // F (rate), I (interlace), A (aspect), X (extension)
      }
    }
    require(w > 0 && h > 0, s"YUV4MPEG2 header missing W/H (got ${w}x$h)")
    val chroma = cs match {
      case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
        require(w % 2 == 0 && h % 2 == 0,
          s"C$cs needs even dimensions, got ${w}x$h")
        (w / 2) * (h / 2)
      case "422" =>
        require(w % 2 == 0, s"C422 needs even width, got $w")
        (w / 2) * h
      case "444" => w * h
      case "mono" => 0
      case other => sys.error(s"unsupported YUV4MPEG2 colorspace C$other")
    }
    Header(w, h, cs, nl + 1, w * h, chroma)
  }

  private val FrameMagic = "FRAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Iterate luma planes (one `Array[Int]` of 0..255 per frame, row
    * major). Chroma planes are skipped by exact size; a truncated or
    * mis-framed payload refuses loudly at the offending frame. */
  def lumaFrames(bytes: Array[Byte]): Iterator[Array[Int]] = {
    val hd = parseHeader(bytes)
    new Iterator[Array[Int]] {
      private var off = hd.headerEnd
      def hasNext: Boolean = off < bytes.length
      def next(): Array[Int] = {
        require(off + FrameMagic.length <= bytes.length &&
            java.util.Arrays.equals(bytes, off, off + FrameMagic.length,
              FrameMagic, 0, FrameMagic.length),
          s"expected FRAME marker at byte $off")
        val nl = bytes.indexOf('\n'.toByte, off)
        require(nl > 0, s"FRAME header at byte $off has no newline")
        val dataStart = nl + 1
        val frameLen = hd.ySize + 2 * hd.chromaSize
        require(dataStart + frameLen <= bytes.length,
          s"truncated frame at byte $off: need $frameLen plane bytes, " +
            s"have ${bytes.length - dataStart}")
        val y = new Array[Int](hd.ySize)
        var i = 0
        while (i < hd.ySize) { y(i) = bytes(dataStart + i) & 0xff; i += 1 }
        off = dataStart + frameLen
        y
      }
    }
  }

  /** Count frames without materializing rasters (header walk only). */
  def frameCount(bytes: Array[Byte]): Int = {
    val hd = parseHeader(bytes)
    var off = hd.headerEnd
    var n = 0
    while (off < bytes.length) {
      val nl = bytes.indexOf('\n'.toByte, off)
      require(nl > 0, s"FRAME header at byte $off has no newline")
      off = nl + 1 + hd.ySize + 2 * hd.chromaSize
      require(off <= bytes.length, s"truncated frame at byte $off")
      n += 1
    }
    n
  }

  /** Deterministic Y4M clip for the gates: luma(x,y,f) = (x·31 + y·17 +
    * f·11 + seed) mod 256 — the SAME closed form as
    * [[Multimodal.syntheticGif]], so the oracles replay identically;
    * chroma planes get a distinct fill ((x·7 + y·3 + f + seed) mod 256)
    * that the luma readers must SKIP exactly (a framing bug drags
    * chroma bytes into the luma sum and breaks the hash). Y4M stores
    * planes raw, so the round trip is lossless by construction. */
  def synthetic(seed: Long, w: Int, h: Int, nFrames: Int,
                colorspace: String = "420jpeg"): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, s"bad video shape ${w}x$h/$nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C$colorspace\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val (cw, ch) = colorspace match {
      case "444" => (w, h)
      case "422" => (w / 2, h)
      case "mono" => (0, 0)
      case _ => (w / 2, h / 2)
    }
    var f = 0
    while (f < nFrames) {
      bos.write("FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          bos.write((((x * 31 + y * 17 + f * 11 + seed) % 256 + 256) % 256).toInt)
          x += 1
        }
        y += 1
      }
      var p = 0
      while (p < 2 * cw * ch) { // U then V, same fill
        val cy = (p % (cw * ch)) / math.max(cw, 1)
        val cx = (p % (cw * ch)) % math.max(cw, 1)
        bos.write((((cx * 7 + cy * 3 + f + seed) % 256 + 256) % 256).toInt)
        p += 1
      }
      f += 1
    }
    bos.toByteArray
  }
}
