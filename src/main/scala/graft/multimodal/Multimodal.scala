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
  * via `javax.sound.sampled` ([[WavCodec]]) — both zero-dependency.
  * Video codecs are NOT in this container, so that kind ships a
  * deterministic fake ([[FakeCodec]]); the Spark-side contract (schema,
  * batching, partitioning, null handling) is identical on every branch,
  * so a JNI/FFM video codec swaps in without touching the pipeline.
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
    * replaces `???` so pipelines run end-to-end and hash-stably. Still
    * the stand-in for video (no video codec libs in this container);
    * images decode for real via [[ImageIoCodec]], WAV audio via
    * [[WavCodec]]. */
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

  /** Production routing: images through the real [[ImageIoCodec]], audio
    * through the real [[WavCodec]], video through the documented
    * [[FakeCodec]] stand-in (no video codec libs in this container). */
  object KindDispatchCodec extends MediaCodec {
    override def decode(kind: String, bytes: Array[Byte]): MediaFeatures =
      kind match {
        case "image" => ImageIoCodec.decode(kind, bytes)
        case "audio" => WavCodec.decode(kind, bytes)
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
    * sample), audio rows resample (frame decimation), other kinds pass
    * through untouched — same partition-parallel batch shape as
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
