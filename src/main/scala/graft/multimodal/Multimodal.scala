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
  * The actual codecs (JPEG decode, audio resample, video frame-sample)
  * are NOT in this container — [[MediaCodec]] isolates them behind a
  * trait and ships a deterministic fake so the Spark-side contract
  * (schema, batching, partitioning, null handling) is real and tested;
  * swap in a JNI/FFM codec without touching the pipeline.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType))))))

  /** Decoded, engine-facing features for one media payload. */
  case class MediaFeatures(n_bytes: Int, width: Int, height: Int, checksum: Long)

  trait MediaCodec extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake: features are pure arithmetic on the payload —
    * replaces `???` so pipelines run end-to-end and hash-stably. Still
    * the stand-in for audio/video (no codec libs in this container);
    * images decode for real via [[ImageIoCodec]]. */
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

  /** Production routing: images through the real [[ImageIoCodec]],
    * audio/video through the documented [[FakeCodec]] stand-in. */
  object KindDispatchCodec extends MediaCodec {
    override def decode(kind: String, bytes: Array[Byte]): MediaFeatures =
      if (kind == "image") ImageIoCodec.decode(kind, bytes)
      else FakeCodec.decode(kind, bytes)
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

  /** Batched decode/feature-extract stage: binary column in, typed
    * feature columns out. Batch shape mirrors mapInPandas: the codec
    * sees `batchSize` payloads per call. */
  def withFeatures(df: DataFrame, bytesCol: String, kindCol: String,
                   codec: MediaCodec = FakeCodec, batchSize: Int = 64): DataFrame = {
    val schema = df.schema
      .add("n_bytes", IntegerType).add("width", IntegerType)
      .add("height", IntegerType).add("checksum", LongType)
    val enc = Encoders.row(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    val kIdx = df.schema.fieldIndex(kindCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val f = codec.decode(r.getString(kIdx), r.getAs[Array[Byte]](bIdx))
          Row.fromSeq(r.toSeq ++ Seq[Any](f.n_bytes, f.width, f.height, f.checksum))
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
