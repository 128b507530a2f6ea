package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "image", Array.tabulate(400)(_.toByte)),
    (2L, "audio", Array.tabulate(100)(i => (i * 3).toByte)),
    (3L, "video", null.asInstanceOf[Array[Byte]]),
    (4L, "image", Array.empty[Byte])).toDF("media_id", "kind", "bytes")

  test("withFeatures: typed features, nulls and empties survive") {
    val out = Multimodal.withFeatures(media, "bytes", "kind")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("n_bytes"), r.getAs[Int]("width"), r.getAs[Long]("checksum"))).toMap
    assert(out(1)._1 == 400 && out(1)._2 == 400 % 640)
    assert(out(3) == ((0, 0, 0L))) // null payload -> zero features, no NPE
    assert(out(4) == ((0, 0, 0L)))
    assert(out(1)._3 != out(2)._3) // checksums discriminate payloads
  }

  test("sampleFrames: every k-th 16-byte slice, bounded by maxFrames and length") {
    val out = Multimodal.sampleFrames(media, "bytes", everyK = 2, maxFrames = 5)
      .select("media_id", "n_sampled", "frames")
      .collect().map(r => r.getLong(0) -> r).toMap
    // media 1: offsets 0,32,64,96,128 all < 400 -> 5 frames of 16 bytes
    assert(out(1L).getAs[Int]("n_sampled") == 5)
    assert(out(1L).getSeq[Array[Byte]](2).forall(_.length == 16))
    // media 2 (100 bytes): offsets 0,32,64,96 -> 4 frames, last one short
    assert(out(2L).getAs[Int]("n_sampled") == 4)
    assert(out(2L).getSeq[Array[Byte]](2).last.length == 4)
    // null payload -> zero frames
    assert(out(3L).getAs[Int]("n_sampled") == 0)
  }
}
