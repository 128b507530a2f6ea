package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, Encoders}
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructType, StructField}

/** Frame-level audio features over REALLY decoded PCM — the DSP step a
  * speech/audio training pipeline runs right after the container parse
  * ([[Multimodal.WavCodec]] stops at aggregates; this exposes the
  * signal): fixed-length sample frames with per-frame energy (Σ s²)
  * and zero-crossing count, the classic voice-activity /
  * silence-trimming signals.
  *
  * Both features are INTEGER functions of the decoded 16-bit samples —
  * energy ≤ 2048²·frameLen ≪ 2^63, crossings ≤ frameLen — so for a
  * lossless container (PCM WAV) a closed-form generator makes the
  * whole decode→frame→feature path oracle-checkable in exact
  * arithmetic, the same construction as the image/video checksums.
  *
  * Scale shape: batched `mapPartitions` beside the decode — samples
  * never leave the task; output is frames-per-doc rows of three longs.
  * Tail samples short of a full frame are dropped (documented;
  * matching any fixed-frame DSP convention).
  */
object AudioFeatures {

  /** Decode 16-bit PCM samples from a WAV/AIFF/AU container (real
    * javax.sound parse; fails loudly on non-PCM-16). */
  def pcmSamples(bytes: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      // mono required too: a multi-channel stream would silently
      // interleave channels into one sample sequence, summing frame
      // energy across channels and counting channel-to-channel sign
      // flips as crossings — wrong VAD features instead of a loud failure
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unsupported audio format ${fmt.getEncoding}/${fmt.getSampleSizeInBits}bit/" +
          s"${fmt.getChannels}ch (need mono 16-bit signed PCM)")
      val data = ais.readAllBytes()
      val out = new Array[Int](data.length / 2)
      var i = 0
      while (i + 1 < data.length) {
        out(i / 2) =
          if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toInt
          else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toInt
        i += 2
      }
      out
    } finally ais.close()
  }

  /** Per-frame (frame_idx, energy = Σ s², crossings = #{sign flips});
    * sign of 0 counts as non-negative. */
  def frameFeatures(samples: Array[Int], frameLen: Int): Seq[(Int, Long, Int)] = {
    require(frameLen > 1, s"bad frameLen=$frameLen")
    (0 until samples.length / frameLen).map { f =>
      val off = f * frameLen
      var energy = 0L
      var crossings = 0
      var i = 0
      while (i < frameLen) {
        val s = samples(off + i)
        energy += s.toLong * s
        if (i > 0 && ((s >= 0) != (samples(off + i - 1) >= 0))) crossings += 1
        i += 1
      }
      (f, energy, crossings)
    }
  }

  /** Explode a binary audio column into per-frame feature rows
    * (original columns + frame_idx, energy, crossings). */
  def withFrameFeatures(df: DataFrame, bytesCol: String, frameLen: Int,
                        batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("energy", LongType),
      StructField("crossings", IntegerType)))
    val enc = Encoders.row(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.flatMap { r =>
          val samples = pcmSamples(r.getAs[Array[Byte]](bIdx))
          frameFeatures(samples, frameLen).map { case (f, e, c) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](f, e, c))
          }
        }
      }
    }(enc)
  }
}
