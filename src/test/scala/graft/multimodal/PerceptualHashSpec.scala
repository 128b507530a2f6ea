package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class PerceptualHashSpec extends AnyFunSuite with SparkSuite {

  test("dhash is invariant to uniform brightness shift") {
    val a = PerceptualHash.dhash(Multimodal.syntheticPngBrightness(7, 0, 17, 14))
    val b = PerceptualHash.dhash(Multimodal.syntheticPngBrightness(7, 39, 17, 14))
    assert(a == b)
  }

  test("dhash is invariant to lossless re-encode (PNG vs BMP of the same raster)") {
    val png = Multimodal.syntheticPngBrightness(3, 5, 20, 12)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    assert(PerceptualHash.dhash(png) == PerceptualHash.dhash(bos.toByteArray))
  }

  test("different patterns hash apart (not a constant function)") {
    val hs = (0 until 10).map(p =>
      PerceptualHash.dhash(Multimodal.syntheticPngBrightness(p, 0, 17, 14))._2)
    assert(hs.distinct.size > 5)
  }

  test("hex and bits encode the same 64 bits") {
    val (bits, hex) = PerceptualHash.dhash(Multimodal.syntheticPngBrightness(11, 3, 10, 9))
    val fromHex = (0 until 8).map { y =>
      java.lang.Long.parseLong(hex.substring(2 * y, 2 * y + 2), 16) << (y * 8)
    }.reduce(_ | _)
    assert(fromHex == bits)
  }

  test("withDhash buckets brightness variants; hammingPairs finds near misses") {
    import spark.implicits._
    // 3 patterns x 4 brightness deltas
    val rows = for (p <- 0 until 3; dl <- 0 until 4) yield
      (p * 10L + dl, Multimodal.syntheticPngBrightness(p, dl * 13, 18, 16))
    val df = rows.toDF("id", "bytes")
    val hashed = PerceptualHash.withDhash(df, "bytes").cache()
    val groups = hashed.groupBy("dhash").count().collect().map(_.getLong(1))
    assert(groups.forall(_ == 4L) && groups.length == 3)

    // exact duplicates are hamming-0 pairs; cross-pattern pairs only if truly near
    val pairs = PerceptualHash.hammingPairs(hashed, "id", maxDist = 0)
    val within = pairs.filter(floor(col("a_id") / 10) === floor(col("b_id") / 10)).count()
    assert(within == 3L * 6) // C(4,2) per pattern
  }

  test("hammingPairs pigeonhole: a 2-bit corruption is still found at maxDist=3") {
    import spark.implicits._
    val base = PerceptualHash.dhash(Multimodal.syntheticPngBrightness(5, 0, 18, 16))._1
    val corrupted = base ^ (1L << 3) ^ (1L << 40) // two flipped bits, distinct bands
    val hashed = Seq((1L, base), (2L, corrupted)).toDF("id", "dhash_bits")
    val pairs = PerceptualHash.hammingPairs(hashed, "id", maxDist = 3).collect()
    assert(pairs.length == 1 && pairs.head.getInt(2) == 2)
  }
}
