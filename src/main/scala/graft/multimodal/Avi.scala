package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JDK decoder for RIFF/AVI video — the COMPRESSED-container step
  * the multimodal family was missing (the r17 verdict's last honest
  * multimodal residual): Y4M (q399/q400) is raw planar framing; AVI
  * carries PER-FRAME CODED payloads, and its canonical
  * dependency-free incarnation is MJPEG — every `00dc` chunk is a
  * complete JPEG image that `javax.imageio` decodes without native
  * codecs. Uncompressed `BI_RGB` AVIs (`00db` DIB frames) are decoded
  * too: they are lossless, which is what lets a closed-form oracle
  * replay the container walk bit-exactly while the JPEG path is gated
  * on decode-noise-robust outputs (planted hard cuts).
  *
  * Format (public spec: Microsoft's AVI RIFF reference — the
  * msdn "AVI RIFF File Reference"; OpenDML extends it, unneeded here):
  * {{{
  * 'RIFF' size 'AVI '
  *   LIST 'hdrl'  'avih' <MainAVIHeader>  LIST 'strl' ('strh' 'strf' ...)
  *   LIST 'movi'  '00dc'/'00db' <frame bytes> ...   // word-aligned
  *   'idx1' <index>                                  // optional
  * }}}
  * All sizes little-endian; every chunk is padded to an even boundary.
  * The `strf` BITMAPINFOHEADER carries (biWidth, biHeight, biBitCount,
  * biCompression): 0 (BI_RGB) = bottom-up BGR rows padded to 4-byte
  * stride; fourcc 'MJPG' = JPEG-per-frame.
  *
  * Gray convention matches [[VideoFeatures]]: the blue channel
  * (`getRGB & 0xff` for decoded JPEG; the first byte of each BGR
  * triple for BI_RGB) — identity-gray synthetic frames make all
  * channels equal anyway.
  *
  * Scale shape: an iterator over frames — one decoded raster in memory
  * at a time, never the clip; callers fold per-frame features and drop
  * the raster (the [[VideoFeatures]] two-frame window).
  */
object Avi {

  /** Container sniff: 'RIFF' .... 'AVI '. */
  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, US_ASCII)

  /** Video stream format from the first video `strf` BITMAPINFOHEADER. */
  final case class Format(width: Int, height: Int, bitCount: Int,
                          compression: String)

  /** Walk `hdrl` for the first video stream's BITMAPINFOHEADER.
    * Refuses loudly when absent — a frame chunk without its format is
    * undecodable, not skippable.
    *
    * A `strf`'s MEANING depends on its stream's `strh` fccType: inside
    * an audio strl it is a WAVEFORMATEX whose nSamplesPerSec /
    * nAvgBytesPerSec land exactly where a BITMAPINFOHEADER keeps
    * width/height (44100/176400 would pass any sane range check), so
    * the walk keeps the fccType of the most recent `strh` and only
    * accepts a `strf` whose stream header said `vids` — never a
    * value-range guess (an r18 advisor finding: real AVIs commonly put
    * the audio strl first). */
  def parseFormat(bytes: Array[Byte]): Format = {
    require(isAvi(bytes), "not a RIFF/AVI payload (bad magic)")
    var fmt: Option[Format] = None
    // chunks arrive in document order, so the strh preceding a strf in
    // the same strl is always the last strh seen; the state RESETS at
    // every strl boundary (and on a truncated strh), so a stream list
    // with a missing/short strh can never inherit the previous
    // stream's 'vids' and misparse its WAVEFORMATEX as a
    // BITMAPINFOHEADER (r19 review finding)
    var lastStrhType: String = ""
    walkList(bytes, 12, bytes.length, (id, listType, start, len) => {
      if (id == "LIST" && listType == "strl")
        lastStrhType = ""
      else if (id == "strh" && listType == "strl")
        lastStrhType = if (len >= 4) fourcc(bytes, start) else ""
      else if (id == "strf" && listType == "strl" && fmt.isEmpty &&
        len >= 40 && lastStrhType == "vids") {
        // BITMAPINFOHEADER: biSize, biWidth, biHeight, planes, bitcount,
        // biCompression (0 = BI_RGB, else a fourcc)
        val w = u32(bytes, start + 4).toInt
        val h = u32(bytes, start + 8).toInt
        val bc = u16(bytes, start + 14)
        val comp = u32(bytes, start + 16)
        val compStr =
          if (comp == 0L) "BI_RGB" else fourcc(bytes, start + 16)
        fmt = Some(Format(w, h, bc, compStr))
      }
    })
    fmt.getOrElse(sys.error("AVI without a video strf BITMAPINFOHEADER"))
  }

  /** Depth-first walk of RIFF chunks in [from, to): callback gets
    * (chunkId, enclosingListType, dataStart, dataLen); LIST chunks
    * recurse. Word alignment (odd sizes pad one byte) is load-bearing —
    * a walker that ignores it desynchronizes on the first odd-sized
    * JPEG frame. */
  private def walkList(bytes: Array[Byte], from: Int, to: Int,
                       f: (String, String, Int, Int) => Unit,
                       listType: String = "AVI "): Unit = {
    var off = from
    while (off + 8 <= to) {
      val id = fourcc(bytes, off)
      val len = u32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= to,
        s"RIFF chunk '$id' at byte $off overruns its parent " +
          s"(len $len, parent end $to)")
      val dataStart = off + 8
      if (id == "LIST" && len >= 4) {
        val lt = fourcc(bytes, dataStart)
        // announce list ENTRY before the children: walkers with
        // per-stream state (parseFormat's lastStrhType) reset at the
        // strl boundary instead of inheriting the previous stream's
        f("LIST", lt, dataStart + 4, len.toInt - 4)
        walkList(bytes, dataStart + 4, dataStart + len.toInt, f, lt)
      } else f(id, listType, dataStart, len.toInt)
      off = dataStart + len.toInt + (len.toInt & 1) // even alignment
    }
  }

  private def isVideoFrameChunk(id: String): Boolean =
    id.length == 4 && id.charAt(0).isDigit && id.charAt(1).isDigit &&
      (id.endsWith("dc") || id.endsWith("db"))

  /** Byte ranges of the video frame chunks inside `movi`, in stream
    * order. */
  def frameChunks(bytes: Array[Byte]): Seq[(Int, Int)] = {
    require(isAvi(bytes), "not a RIFF/AVI payload (bad magic)")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    walkList(bytes, 12, bytes.length, (id, listType, start, len) => {
      if (listType == "movi" && isVideoFrameChunk(id)) out += ((start, len))
    })
    out.toSeq
  }

  private val JpegMagic = Array[Byte](0xff.toByte, 0xd8.toByte)

  /** Iterate gray rasters (one `Array[Int]` of 0..255 per frame, row
    * major, top-down). MJPG frames go through ImageIO's JPEG reader;
    * BI_RGB frames are decoded directly (bottom-up BGR rows, 4-byte
    * stride — both flips are load-bearing and oracle-checked). */
  def grayFrames(bytes: Array[Byte]): Iterator[Array[Int]] = {
    val fmt = parseFormat(bytes)
    val chunks = frameChunks(bytes)
    require(chunks.nonEmpty, "AVI with zero video frame chunks")
    chunks.iterator.map { case (start, len) =>
      if (len >= 2 && bytes(start) == JpegMagic(0) && bytes(start + 1) == JpegMagic(1))
        decodeJpegGray(bytes, start, len)
      else decodeDibGray(bytes, start, len, fmt)
    }
  }

  private def decodeJpegGray(bytes: Array[Byte], start: Int, len: Int): Array[Int] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes, start, len))
    require(img != null, s"undecodable JPEG frame at byte $start")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
      y += 1
    }
    out
  }

  private def decodeDibGray(bytes: Array[Byte], start: Int, len: Int,
                            fmt: Format): Array[Int] = {
    require(fmt.compression == "BI_RGB" && fmt.bitCount == 24,
      s"unsupported DIB frame: ${fmt.compression}/${fmt.bitCount}bpp " +
        "(supported: BI_RGB 24bpp and MJPG)")
    val w = fmt.width
    // negative biHeight = top-down rows (the less common orientation)
    val h = math.abs(fmt.height)
    val bottomUp = fmt.height > 0
    val stride = ((w * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    require(len >= stride * h,
      s"truncated BI_RGB frame: need ${stride * h} bytes, have $len")
    val out = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      val srcRow = if (bottomUp) h - 1 - row else row
      val base = start + srcRow * stride
      var x = 0
      while (x < w) {
        out(row * w + x) = bytes(base + x * 3) & 0xff // blue byte
        x += 1
      }
      row += 1
    }
    out
  }

  /** Frame count from the container walk alone (no decode). */
  def frameCount(bytes: Array[Byte]): Int = frameChunks(bytes).length

  /** Decode ONE frame chunk by its [[frameChunks]] range — the sampling
    * path: a walker that samples every k-th frame pays k-th of the
    * JPEG decode, not all of it. */
  def grayFrameAt(bytes: Array[Byte], range: (Int, Int),
                  fmt: Format): Array[Int] = {
    val (start, len) = range
    if (len >= 2 && bytes(start) == JpegMagic(0) && bytes(start + 1) == JpegMagic(1))
      decodeJpegGray(bytes, start, len)
    else decodeDibGray(bytes, start, len, fmt)
  }

  // ---------------------------------------------------------------- //
  // Synthetic clips for the gates                                     //
  // ---------------------------------------------------------------- //

  private def writeU32(bos: java.io.ByteArrayOutputStream, v: Long): Unit = {
    bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
    bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(id.getBytes(US_ASCII))
    writeU32(bos, body.length.toLong)
    bos.write(body)
    if ((body.length & 1) == 1) bos.write(0) // even alignment
    bos.toByteArray
  }

  private def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
    val inner = bodies.flatten.toArray
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("LIST".getBytes(US_ASCII))
    writeU32(bos, (4 + inner.length).toLong)
    bos.write(listType.getBytes(US_ASCII))
    bos.write(inner)
    bos.toByteArray
  }

  private def bitmapInfoHeader(w: Int, h: Int, bitCount: Int,
                               compression: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    writeU32(bos, 40); writeU32(bos, w.toLong); writeU32(bos, h.toLong)
    bos.write(1); bos.write(0) // planes
    bos.write(bitCount & 0xff); bos.write((bitCount >> 8) & 0xff)
    bos.write(compression) // 4 bytes
    writeU32(bos, 0); writeU32(bos, 0); writeU32(bos, 0)
    writeU32(bos, 0); writeU32(bos, 0)
    bos.toByteArray
  }

  private def assemble(w: Int, h: Int, nFrames: Int,
                       compression: Array[Byte], bitCount: Int,
                       frames: Seq[Array[Byte]], dc: Boolean): Array[Byte] = {
    val avih = {
      val bos = new java.io.ByteArrayOutputStream()
      writeU32(bos, 40000L)          // usec/frame (25 fps)
      writeU32(bos, 0); writeU32(bos, 0); writeU32(bos, 0)
      writeU32(bos, nFrames.toLong)  // dwTotalFrames
      writeU32(bos, 0); writeU32(bos, 1) // streams
      writeU32(bos, 0)
      writeU32(bos, w.toLong); writeU32(bos, h.toLong)
      writeU32(bos, 0); writeU32(bos, 0); writeU32(bos, 0); writeU32(bos, 0)
      bos.toByteArray
    }
    val strh = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("vids".getBytes(US_ASCII))
      bos.write(compression)
      writeU32(bos, 0); writeU32(bos, 0); writeU32(bos, 0)
      writeU32(bos, 1); writeU32(bos, 25) // rate 25/1
      writeU32(bos, 0); writeU32(bos, nFrames.toLong)
      writeU32(bos, 0); writeU32(bos, 0); writeU32(bos, 0); writeU32(bos, 0)
      bos.toByteArray
    }
    val hdrl = list("hdrl", Seq(
      chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh),
        chunk("strf", bitmapInfoHeader(w, h, bitCount, compression))))))
    val movi = list("movi",
      frames.map(f => chunk(if (dc) "00dc" else "00db", f)))
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("RIFF".getBytes(US_ASCII))
    writeU32(bos, (4 + hdrl.length + movi.length).toLong)
    bos.write("AVI ".getBytes(US_ASCII))
    bos.write(hdrl); bos.write(movi)
    bos.toByteArray
  }

  /** Deterministic UNCOMPRESSED (BI_RGB 24bpp bottom-up) AVI:
    * gray(x,y,f) = (x·31 + y·17 + f·11 + seed) mod 256 — the
    * [[Y4m.synthetic]]/syntheticGif closed form, so the oracles replay
    * the full container walk + bottom-up flip + stride padding
    * exactly (the DIB path is lossless). Width is deliberately NOT a
    * multiple of 4 sometimes, so the row stride padding is exercised. */
  def syntheticDib(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, s"bad video shape ${w}x$h/$nFrames")
    val stride = ((w * 3 + 3) / 4) * 4
    val frames = (0 until nFrames).map { f =>
      val body = new Array[Byte](stride * h)
      var row = 0
      while (row < h) {
        val y = h - 1 - row // bottom-up storage
        var x = 0
        while (x < w) {
          val g = (((x * 31 + y * 17 + f * 11 + seed) % 256 + 256) % 256).toByte
          val base = row * stride + x * 3
          body(base) = g; body(base + 1) = g; body(base + 2) = g // B,G,R
          x += 1
        }
        row += 1
      }
      body
    }
    assemble(w, h, nFrames, Array[Byte](0, 0, 0, 0), 24, frames, dc = false)
  }

  /** Deterministic MJPEG AVI of UNIFORM-gray frames with planted hard
    * cuts: frame f is solid gray `low` except every `cutEvery`-th
    * frame, which is solid `high`. JPEG is lossy, but a uniform frame
    * decodes within a few gray levels of its input (DC-only blocks), so
    * |high − low| ≥ 96 makes cut detection at a mid threshold robust to
    * decode noise — the gate emits CUT FLAGS, not raw sums, and a
    * closed form replays those. Encoded with ImageIO's stock JPEG
    * writer (the real codec path). */
  def syntheticMjpeg(seed: Long, w: Int, h: Int, nFrames: Int,
                     cutEvery: Int, low: Int = 64, high: Int = 192): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0 && cutEvery >= 2,
      s"bad mjpeg shape ${w}x$h/$nFrames/$cutEvery")
    val frames = (0 until nFrames).map { f =>
      val g = if (f % cutEvery == (seed % cutEvery).toInt) high else low
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ok = javax.imageio.ImageIO.write(img, "jpg", bos)
      require(ok, "no stock JPEG writer available")
      bos.toByteArray
    }
    assemble(w, h, nFrames, "MJPG".getBytes(US_ASCII), 24, frames, dc = true)
  }
}
