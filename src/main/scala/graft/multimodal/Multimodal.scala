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
    * replaces `???` so pipelines run end-to-end and hash-stably. */
  object FakeCodec extends MediaCodec {
    override def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      val n = if (bytes == null) 0 else bytes.length
      var sum = 0L; var i = 0
      while (i < n) { sum = (sum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
      MediaFeatures(n, n % 640, (n * 7) % 480, sum)
    }
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
