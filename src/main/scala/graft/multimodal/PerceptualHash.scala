package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Perceptual image hashing (difference hash) over REALLY decoded
  * pixels — the multimodal member of the dedup family: where
  * [[graft.operators.Dedup]] fingerprints text, this fingerprints the
  * raster, so re-encoded/brightness-shifted copies of one image land in
  * one bucket.
  *
  * dHash (the classic 64-bit difference hash): decode → grayscale →
  * nearest-neighbor downsample to a 9×8 grid → one bit per adjacent
  * horizontal pair (left < right) → 8 row-bytes. Gradient comparisons
  * make the hash invariant to any monotone per-image brightness shift
  * and to re-encoding through a lossless container — exactly the
  * variants a crawl corpus repeats at scale. The decode is the real
  * JDK ImageIO path ([[Multimodal.ImageIoCodec]] formats); an
  * undecodable payload fails loudly.
  *
  * Scale shape: hashing runs inside the partition (pixels never leave
  * the decode task); the dedup groupBy shuffles (doc_id, 8-byte hash)
  * pairs only. Hamming-near pairs (dist ≤ 3) use the pigeonhole band
  * join ([[hammingPairs]]): four 16-bit bands, equal-band bucket join,
  * exact popcount verify — the same blocked-pair shape as SimHash, so
  * the pair space tracks bucket skew, never n².
  */
object PerceptualHash {

  /** 64-bit dHash of one image payload: (bitsAsLong, 16-char lower-hex
    * row-major encoding). Gray = blue channel (gate images are gray;
    * for RGB inputs the blue plane is a legitimate fixed projection). */
  def dhash(bytes: Array[Byte]): (Long, String) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    // NN sample of the 9x8 grid: src = (dst * srcDim) / gridDim
    val g = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        g(y)(x) = img.getRGB((x * w) / 9, (y * h) / 8) & 0xff
        x += 1
      }
      y += 1
    }
    var bits = 0L
    val hex = new StringBuilder(16)
    y = 0
    while (y < 8) {
      var rowByte = 0
      var x = 0
      while (x < 8) {
        if (g(y)(x) < g(y)(x + 1)) rowByte |= (1 << x)
        x += 1
      }
      bits |= rowByte.toLong << (y * 8)
      hex.append(f"$rowByte%02x")
      y += 1
    }
    (bits, hex.toString)
  }

  /** Batched partition-local hashing: adds `dhash` (hex, the stable
    * cross-engine key) and `dhash_bits` (the same 64 bits as a long,
    * for hamming arithmetic). */
  def withDhash(df: DataFrame, bytesCol: String, batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add("dhash", StringType).add("dhash_bits", LongType)
    val enc = Encoders.row(schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val (bits, hex) = dhash(r.getAs[Array[Byte]](bIdx))
          Row.fromSeq(r.toSeq ++ Seq[Any](hex, bits))
        }
      }
    }(enc)
  }

  /** Hamming-near pairs over a hashed frame: pigeonhole on four 16-bit
    * bands (any pair at distance ≤ 3 shares at least one band), bucket
    * join per band, exact `bit_count(xor)` verify, distinct pairs.
    * Same scale shape as the SimHash band join. */
  def hammingPairs(hashed: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, s"4-band pigeonhole only guarantees dist<=3, got $maxDist")
    val bands = (0 until 4).map { b =>
      hashed.select(col(idCol), col("dhash_bits"),
        lit(b).as("band"),
        shiftrightunsigned(col("dhash_bits"), b * 16).bitwiseAND(lit(0xffffL)).as("bkey"))
    }.reduce(_ unionByName _)
    val l = bands.select(col(idCol).as("a_id"), col("dhash_bits").as("a_bits"),
      col("band"), col("bkey"))
    val r = bands.select(col(idCol).as("b_id"), col("dhash_bits").as("b_bits"),
      col("band"), col("bkey"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist", bit_count(col("a_bits").bitwiseXOR(col("b_bits"))))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
      .distinct()
  }
}
