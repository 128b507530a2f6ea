package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, Encoders}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType, StructField}

/** Frame-to-frame difference features over REALLY decoded video frames
  * — the first analysis step of every video curation pipeline
  * (shot/scene-change detection, static-clip filtering, frame-sampling
  * keyed to motion): for consecutive frames, the sum of absolute
  * per-pixel differences. A hard cut spikes the delta; a static clip
  * holds it at ~0 (and an all-zero delta track is the classic
  * "this video is a still image" dedup/quality signal).
  *
  * Decode is the real multi-frame ImageIO path
  * ([[Multimodal.GifVideoCodec]]'s reader — `getNumImages(true)` +
  * `read(i)`); the delta is an integer function of the decoded rasters,
  * so a lossless closed-form generator ([[Multimodal.syntheticGif]])
  * makes decode → frame iteration → differencing oracle-checkable in
  * exact arithmetic — same construction as the audio frame features.
  *
  * Scale shape: batched `mapPartitions`; only (doc, frame, delta)
  * longs leave the task, never rasters. Per-payload memory is two
  * frames (previous + current), not the whole clip.
  */
object VideoFeatures {

  /** (frame_idx ≥ 1, Σ|gray_f − gray_{f−1}|) per consecutive frame
    * pair. Container dispatch by magic bytes, like production ingest:
    * YUV4MPEG2 payloads stream through the pure-JDK [[Y4m]] luma
    * iterator (gray = luma); anything else goes to ImageIO's
    * multi-frame reader (animated GIF; gray = blue channel —
    * identity-palette GIFs are gray), which refuses loudly on
    * containers it cannot parse. */
  def frameDeltas(bytes: Array[Byte]): Seq[(Int, Long)] =
    if (Y4m.isY4m(bytes)) deltasOf(Y4m.lumaFrames(bytes))
    else if (Avi.isAvi(bytes)) deltasOf(Avi.grayFrames(bytes))
    else frameDeltasImageIo(bytes)

  private def deltasOf(frames: Iterator[Array[Int]]): Seq[(Int, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var prev: Array[Int] = null
    var f = 0
    frames.foreach { cur =>
      if (prev != null) {
        require(cur.length == prev.length, "frame size changed mid-clip")
        var d = 0L
        var i = 0
        while (i < cur.length) { d += math.abs(cur(i) - prev(i)); i += 1 }
        out += ((f, d))
      }
      prev = cur
      f += 1
    }
    require(f > 0, "video container with zero decodable frames")
    out.toSeq
  }

  private def frameDeltasImageIo(bytes: Array[Byte]): Seq[(Int, Long)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, s"undecodable video payload (${bytes.length} bytes)")
    val r = readers.next()
    r.setInput(iis)
    try {
      val n = r.getNumImages(true)
      require(n > 0, "video container with zero decodable frames")
      var prev: Array[Int] = null
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      var f = 0
      while (f < n) {
        val img = r.read(f)
        val cur = new Array[Int](img.getWidth * img.getHeight)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            cur(y * img.getWidth + x) = img.getRGB(x, y) & 0xff
            x += 1
          }
          y += 1
        }
        if (prev != null) {
          require(cur.length == prev.length, "frame size changed mid-clip")
          var d = 0L
          var i = 0
          while (i < cur.length) { d += math.abs(cur(i) - prev(i)); i += 1 }
          out += ((f, d))
        }
        prev = cur
        f += 1
      }
      out.toSeq
    } finally { r.dispose(); iis.close() }
  }

  /** Explode a binary video column into per-frame-pair delta rows. */
  def withFrameDeltas(df: DataFrame, bytesCol: String,
                      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("delta", LongType)))
    val enc = Encoders.row(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.flatMap { r =>
          frameDeltas(r.getAs[Array[Byte]](bIdx)).map { case (f, d) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](f, d))
          }
        }
      }
    }(enc)
  }
}
