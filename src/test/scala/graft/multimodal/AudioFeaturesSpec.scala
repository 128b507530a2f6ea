package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class AudioFeaturesSpec extends AnyFunSuite with SparkSuite {

  test("pcm decode round-trips the generator formula exactly") {
    val wav = Multimodal.syntheticWav(seed = 9, sampleRate = 8000, nFrames = 100)
    val got = AudioFeatures.pcmSamples(wav)
    val want = (0 until 100).map(i => (((i * 13L + 9L * 7L) % 4096L) - 2048L).toInt)
    assert(got.toSeq == want)
  }

  test("energy and crossings computed per frame on a crafted square wave") {
    // +1000, -1000 alternating: every adjacent pair flips sign
    val samples = Array.tabulate(64)(i => if (i % 2 == 0) 1000 else -1000)
    val frames = AudioFeatures.frameFeatures(samples, frameLen = 32)
    assert(frames.length == 2)
    frames.foreach { case (_, energy, crossings) =>
      assert(energy == 32L * 1000 * 1000)
      assert(crossings == 31)
    }
    // DC signal: zero crossings
    val dc = AudioFeatures.frameFeatures(Array.fill(32)(500), 32)
    assert(dc.head._3 == 0)
  }

  test("tail samples short of a frame are dropped") {
    val frames = AudioFeatures.frameFeatures(Array.fill(70)(1), frameLen = 32)
    assert(frames.length == 2) // 70 = 2*32 + 6 dropped
  }

  test("withFrameFeatures explodes per-frame rows over the real decode") {
    import spark.implicits._
    val df = Seq((1L, Multimodal.syntheticWav(1, 8000, 96)),
      (2L, Multimodal.syntheticWav(2, 12000, 40)))
      .toDF("id", "bytes")
    val out = AudioFeatures.withFrameFeatures(df, "bytes", frameLen = 32)
      .select("id", "frame_idx").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(out == Map(1L -> 3, 2L -> 1))
  }
}
