package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, processed in batched partition-parallel
  * stages (the Scala analog of `mapInPandas`: one buffer of rows per
  * batch through the codec, so a real decoder amortizes native-library
  * calls exactly like an Arrow batch would).
  *
  * Codecs live behind the [[MediaCodec]] seam: images decode for REAL
  * via the JDK's `javax.imageio` ([[ImageIoCodec]]), WAV audio for REAL
  * via `javax.sound.sampled` ([[WavCodec]]), and video for REAL via
  * multi-frame containers the JDK's ImageIO can parse — animated GIF —
  * through [[GifVideoCodec]] (`ImageReader.getNumImages(true)` /
  * `read(i)`): real frame counts, real per-frame rasters, per-frame
  * pixel checksums, all zero-dependency. Containers ImageIO cannot
  * parse fail LOUDLY (no silent fake features); [[FakeCodec]] remains
  * only as the documented stand-in for `kind` values outside
  * image/audio/video. The Spark-side contract (schema, batching,
  * partitioning, null handling) is identical on every branch, so a
  * JNI/FFM codec for MP4-class containers swaps in without touching
  * the pipeline.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType))))))

  /** Decoded, engine-facing features for one media payload. Image
    * decodes fill width/height, audio decodes fill sample_rate/n_frames;
    * the unused axis stays 0 so one schema serves every kind. */
  case class MediaFeatures(n_bytes: Int, width: Int, height: Int, checksum: Long,
                           sample_rate: Int = 0, n_frames: Int = 0)

  trait MediaCodec extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake: features are pure arithmetic on the payload —
    * replaces `???` so pipelines run end-to-end and hash-stably. Only
    * reachable for `kind` values outside image/audio/video; every real
    * kind routes through a real JDK decoder ([[ImageIoCodec]],
    * [[WavCodec]], [[GifVideoCodec]]) that fails loudly on payloads it
    * cannot parse. */
  object FakeCodec extends MediaCodec {
    override def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      val n = if (bytes == null) 0 else bytes.length
      var sum = 0L; var i = 0
      while (i < n) { sum = (sum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
      MediaFeatures(n, n % 640, (n * 7) % 480, sum)
    }
  }

  /** REAL image decode on the JDK's `javax.imageio` — PNG/BMP/GIF/JPEG
    * with zero new dependencies. width/height come from the decoded
    * raster; checksum is the blue-channel sum over all pixels, so for
    * lossless formats (PNG/BMP) it is reproducible from whatever formula
    * generated the pixels — which is what lets [[syntheticPng]]-driven
    * gates hold the decode to a closed-form oracle. An undecodable
    * payload fails loudly (null from ImageIO.read) rather than emitting
    * fake zeros as if it had decoded. */
  object ImageIoCodec extends MediaCodec {
    override def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      if (bytes == null || bytes.isEmpty) return MediaFeatures(0, 0, 0, 0L)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"undecodable image payload (${bytes.length} bytes)")
      var sum = 0L; var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xff; x += 1 }
        y += 1
      }
      MediaFeatures(bytes.length, img.getWidth, img.getHeight, sum)
    }
  }

  /** REAL audio decode on the JDK's `javax.sound.sampled` — WAV/AIFF/AU
    * container parse + PCM samples with zero new dependencies (stream
    * parsing needs no audio device, so it runs headless). sample_rate
    * and n_frames come from the decoded format/stream; checksum is the
    * sum of the signed 16-bit samples across all channels — PCM is
    * lossless, so a closed-form generator ([[syntheticWav]]) makes the
    * decode oracle-checkable the same way PNG pixels are. Undecodable
    * or non-16-bit payloads fail loudly rather than emitting zeros. */
  object WavCodec extends MediaCodec {
    override def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      if (bytes == null || bytes.isEmpty) return MediaFeatures(0, 0, 0, 0L)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && fmt.getSampleSizeInBits == 16,
          s"unsupported audio encoding ${fmt.getEncoding}/${fmt.getSampleSizeInBits}bit")
        val data = ais.readAllBytes()
        var sum = 0L; var i = 0
        while (i + 1 < data.length) {
          val s =
            if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
          sum += s; i += 2
        }
        MediaFeatures(bytes.length, 0, 0, sum,
          fmt.getSampleRate.toInt, (data.length / fmt.getFrameSize).toInt)
      } finally ais.close()
    }
  }

  /** Open an ImageIO reader over an in-memory container, failing loudly
    * when no installed reader understands the bytes — an unparseable
    * video payload must never silently degrade to fake features. */
  private def openReader(bytes: Array[Byte])
      : (javax.imageio.ImageReader, javax.imageio.stream.ImageInputStream) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, s"undecodable video payload (${bytes.length} bytes)")
    val r = readers.next()
    r.setInput(iis)
    (r, iis)
  }

  /** REAL video decode for multi-frame containers the JDK's ImageIO can
    * parse (animated GIF) — `ImageReader.getNumImages(true)` for the
    * real frame count, `read(i)` for each frame's real raster, with
    * zero new dependencies. width/height come from frame 0; checksum
    * folds the per-frame blue-channel pixel sums across ALL frames, so
    * a bug in frame iteration, frame dims, or any frame's pixels breaks
    * it. [[syntheticGif]] writes frames against an identity grayscale
    * palette (GIF's LZW is lossless), so the checksum stays closed-form
    * for the oracle. Unparseable containers fail loudly via
    * [[openReader]]. */
  object GifVideoCodec extends MediaCodec {
    override def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      if (bytes == null || bytes.isEmpty) return MediaFeatures(0, 0, 0, 0L)
      if (Y4m.isY4m(bytes)) { // r17: second real container, pure-JDK path
        val hd = Y4m.parseHeader(bytes)
        var sum = 0L; var n = 0
        Y4m.lumaFrames(bytes).foreach { luma =>
          var i = 0
          while (i < luma.length) { sum += luma(i); i += 1 }
          n += 1
        }
        require(n > 0, "video container with zero decodable frames")
        return MediaFeatures(bytes.length, hd.w, hd.h, sum, 0, n)
      }
      val (r, iis) = openReader(bytes)
      try {
        val n = r.getNumImages(true)
        require(n > 0, "video container with zero decodable frames")
        var sum = 0L; var w = 0; var h = 0; var i = 0
        while (i < n) {
          val img = r.read(i)
          if (i == 0) { w = img.getWidth; h = img.getHeight }
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xff; x += 1 }
            y += 1
          }
          i += 1
        }
        MediaFeatures(bytes.length, w, h, sum, 0, n)
      } finally { r.dispose(); iis.close() }
    }
  }

  /** Production routing: every real media kind through a real JDK
    * decoder — images via [[ImageIoCodec]], audio via [[WavCodec]],
    * video via [[GifVideoCodec]] (each failing loudly on payloads it
    * cannot parse); only unknown kinds fall to the documented
    * [[FakeCodec]] stand-in. */
  object KindDispatchCodec extends MediaCodec {
    override def decode(kind: String, bytes: Array[Byte]): MediaFeatures =
      kind match {
        case "image" => ImageIoCodec.decode(kind, bytes)
        case "audio" => WavCodec.decode(kind, bytes)
        case "video" => GifVideoCodec.decode(kind, bytes)
        case _ => FakeCodec.decode(kind, bytes)
      }
  }

  /** Deterministic grayscale PNG: pixel (x,y) = (x·31 + y·17 + seed) mod
    * 256 on all three channels. PNG is lossless, so the decoded
    * blue-channel checksum equals Σ over pixels of that formula — a sum
    * any engine (or the DuckDB oracle) computes without a decoder. */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad image dims ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (((x * 31 + y * 17 + seed) % 256 + 256) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Brightness-shifted variant family for the perceptual-hash gates:
    * pixel (x,y) = (x·23 + y·11 + seed·37) mod 200 + delta, delta ∈
    * [0, 56). The base term never exceeds 199 and delta keeps the sum
    * < 256, so there is NO mod-256 wraparound — adjacent-pixel ORDER is
    * identical for every delta, which is exactly the invariance dHash
    * promises (and the closed form the oracle replays without a
    * decoder; PNG is lossless). */
  def syntheticPngBrightness(seed: Long, delta: Int, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad image dims ${w}x$h")
    require(delta >= 0 && delta < 56, s"delta $delta would wrap mod 256")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((((x * 23 + y * 11 + seed * 37) % 200 + 200) % 200) + delta).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV: sample(i) = ((i·13 + seed·7)
    * mod 4096) − 2048. PCM is lossless, so the decoded sample-sum
    * checksum equals Σ over i of that formula — computable by any
    * engine (or the DuckDB oracle) without an audio stack. */
  def syntheticWav(seed: Long, sampleRate: Int, nFrames: Int): Array[Byte] = {
    require(sampleRate > 0 && nFrames > 0, s"bad wav shape $sampleRate/$nFrames")
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (((i * 13L + seed * 7L) % 4096L) - 2048L).toShort
      data(2 * i) = (s & 0xff).toByte            // little-endian
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Identity grayscale palette: index v renders as (v,v,v). GIF stores
    * at most 256 palette entries, so this palette round-trips every
    * 8-bit gray losslessly — and unlike TYPE_BYTE_GRAY, an indexed
    * image's getRGB does NO gray→sRGB gamma conversion, so the decoded
    * channel value IS the generator's formula value. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Encode frames as one animated GIF via the JDK's ImageIO sequence
    * writer (`prepareWriteSequence`/`writeToSequence`). Interlacing is
    * explicitly DISABLED: the JDK's GIF writer emits wrong row order
    * for interlaced frames with small heights (rows land on the
    * interlace passes of a taller image), which would corrupt the
    * round-trip this codec is oracle-checked on. */
  private def writeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "cannot encode a zero-frame video")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), param)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic grayscale animated GIF: frame f, pixel (x,y) =
    * (x·31 + y·17 + f·11 + seed) mod 256 against the identity gray
    * palette. GIF's LZW + a 256-entry palette are lossless, so the
    * decoded all-frames checksum equals Σ over (f,y,x) of that
    * formula — a sum any engine (or the DuckDB oracle) computes
    * without a decoder. */
  def syntheticGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, s"bad video shape ${w}x$h/$nFrames")
    val cm = grayPalette
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0,
            (((x * 31 + y * 17 + f * 11 + seed) % 256 + 256) % 256).toInt)
          x += 1
        }
        y += 1
      }
      img
    }
    writeGif(frames)
  }

  /** REAL video temporal downsample: decode every frame via the real
    * reader, keep every `factor`-th (decimation from frame 0 — the
    * frame-axis analog of [[resampleWavNN]]), re-encode as an animated
    * GIF. The kept frames' rasters pass through untouched, so a
    * closed-form generator stays closed-form with f ↦ factor·j. */
  def decimateGifFrames(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"bad factor $factor")
    val (r, iis) = openReader(bytes)
    try {
      val n = r.getNumImages(true)
      require(n > 0, "video container with zero decodable frames")
      writeGif((0 until n by factor).map(r.read))
    } finally { r.dispose(); iis.close() }
  }

  /** REAL frame sampling over video payloads: decode every `everyK`-th
    * frame (up to `maxFrames`) through the real reader and emit its
    * pixel checksum — the distributed frame-extraction stage, batched
    * like [[withFeatures]] so a native decoder amortizes per-batch.
    * Output columns: `n_sampled` (frames actually decoded) and
    * `frame_sums` (per-sampled-frame blue-channel pixel sums, in frame
    * order). */
  def sampleVideoFrames(df: DataFrame, bytesCol: String, everyK: Int,
                        maxFrames: Int, batchSize: Int = 64): DataFrame = {
    require(everyK >= 1 && maxFrames >= 1, s"bad sampling $everyK/$maxFrames")
    val schema = df.schema
      .add("n_sampled", IntegerType)
      .add("frame_sums", ArrayType(LongType, containsNull = false))
    val enc = Encoders.row(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { row =>
          val bytes = row.getAs[Array[Byte]](bIdx)
          val sums: Seq[Long] =
            if (bytes == null || bytes.isEmpty) Seq.empty
            else if (Avi.isAvi(bytes)) {
              // RIFF/AVI: the container walk indexes frame chunks
              // without decoding, so every-kth sampling decodes ONLY the
              // sampled frames — the point of a coded container
              val fmt = Avi.parseFormat(bytes)
              val chunks = Avi.frameChunks(bytes)
              chunks.indices.by(everyK).take(maxFrames).map { i =>
                val g = Avi.grayFrameAt(bytes, chunks(i), fmt)
                var sum = 0L; var j = 0
                while (j < g.length) { sum += g(j); j += 1 }
                sum
              }
            } else if (Y4m.isY4m(bytes)) {
              // pure-JDK Y4M path: sample the luma stream in one walk —
              // the iterator holds one plane at a time, so sampling a
              // long clip never materializes it
              val wanted = scala.collection.mutable.ArrayBuffer.empty[Long]
              var i = 0
              val it = Y4m.lumaFrames(bytes)
              while (it.hasNext && wanted.length < maxFrames) {
                val luma = it.next()
                if (i % everyK == 0) {
                  var sum = 0L; var j = 0
                  while (j < luma.length) { sum += luma(j); j += 1 }
                  wanted += sum
                }
                i += 1
              }
              wanted.toSeq
            } else {
              val (r, iis) = openReader(bytes)
              try {
                val n = r.getNumImages(true)
                (0 until n by everyK).take(maxFrames).map { i =>
                  val img = r.read(i)
                  var sum = 0L; var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xff; x += 1 }
                    y += 1
                  }
                  sum
                }
              } finally { r.dispose(); iis.close() }
            }
          Row.fromSeq(row.toSeq ++ Seq[Any](sums.length, sums))
        }
      }
    }(enc)
  }

  /** REAL image resize: decode via ImageIO, nearest-neighbor sample the
    * raster down by an integer `factor` (src pixel = dst pixel ×
    * factor — deterministic integer mapping, no library-dependent
    * pixel-center rounding), re-encode PNG. Lossless in both directions
    * for the sampled pixels, so a closed-form generator stays
    * closed-form through the resize. */
  def resizePngNN(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"bad factor $factor")
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(src != null, s"undecodable image payload (${bytes.length} bytes)")
    val dw = math.max(1, src.getWidth / factor)
    val dh = math.max(1, src.getHeight / factor)
    val dst = new java.awt.image.BufferedImage(
      dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        dst.setRGB(x, y, src.getRGB(x * factor, y * factor))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** REAL audio resample: decode the 16-bit PCM stream, keep every
    * `factor`-th frame (decimation from frame 0 — the integer analog of
    * the image path), re-encode WAV at rate/factor. */
  def resampleWavNN(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"bad factor $factor")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unsupported audio for resample: ${fmt.getEncoding}/${fmt.getChannels}ch")
      val data = ais.readAllBytes()
      val nFrames = data.length / 2
      val outN = (nFrames + factor - 1) / factor
      val out = new Array[Byte](outN * 2)
      var i = 0
      while (i < outN) {
        out(2 * i) = data(2 * i * factor)
        out(2 * i + 1) = data(2 * i * factor + 1)
        i += 1
      }
      val outFmt = new javax.sound.sampled.AudioFormat(
        math.max(1f, fmt.getSampleRate / factor), 16, 1, true, fmt.isBigEndian)
      val outAis = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(out), outFmt, outN.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        outAis, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    } finally ais.close()
  }

  /** Batched media downscale stage: image rows resize (NN raster
    * sample), audio rows resample (PCM frame decimation), video rows
    * temporally downsample (REAL GIF frame decimation), other kinds
    * pass through untouched — same partition-parallel batch shape as
    * [[withFeatures]]. The output column carries REAL re-encoded
    * containers, so it feeds [[withFeatures]] for verification. */
  def withDownscaled(df: DataFrame, bytesCol: String, kindCol: String,
                     factor: Int, outCol: String = "bytes_small",
                     batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val enc = Encoders.row(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    val kIdx = df.schema.fieldIndex(kindCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](bIdx)
          val small = r.getString(kIdx) match {
            case _ if bytes == null || bytes.isEmpty => bytes
            case "image" => resizePngNN(bytes, factor)
            case "audio" => resampleWavNN(bytes, factor)
            case "video" => decimateGifFrames(bytes, factor)
            case _ => bytes
          }
          Row.fromSeq(r.toSeq :+ small)
        }
      }
    }(enc)
  }

  /** Batched decode/feature-extract stage: binary column in, typed
    * feature columns out. Batch shape mirrors mapInPandas: the codec
    * sees `batchSize` payloads per call. */
  def withFeatures(df: DataFrame, bytesCol: String, kindCol: String,
                   codec: MediaCodec = FakeCodec, batchSize: Int = 64): DataFrame = {
    val schema = df.schema
      .add("n_bytes", IntegerType).add("width", IntegerType)
      .add("height", IntegerType).add("checksum", LongType)
      .add("sample_rate", IntegerType).add("n_frames", IntegerType)
    val enc = Encoders.row(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    val kIdx = df.schema.fieldIndex(kindCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val f = codec.decode(r.getString(kIdx), r.getAs[Array[Byte]](bIdx))
          Row.fromSeq(r.toSeq ++ Seq[Any](
            f.n_bytes, f.width, f.height, f.checksum, f.sample_rate, f.n_frames))
        }
      }
    }(enc)
  }

  /** Deterministic frame sampler for video-ish payloads: every k-th
    * 16-byte slice, up to n frames (the partition-parallel shape of
    * frame extraction; slices stand in for decoded frames). */
  def sampleFrames(df: DataFrame, bytesCol: String, everyK: Int, maxFrames: Int): DataFrame = {
    val sampler = udf { bytes: Array[Byte] =>
      if (bytes == null) Seq.empty[Array[Byte]]
      else (0 until maxFrames).map(_ * everyK * 16)
        .filter(_ < bytes.length)
        .map(off => bytes.slice(off, math.min(off + 16, bytes.length)))
    }
    df.withColumn("frames", sampler(col(bytesCol)))
      .withColumn("n_sampled", size(col("frames")))
  }
}
