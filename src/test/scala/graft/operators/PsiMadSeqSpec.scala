package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the r13 batch-4 trio: PSI (identity → 0,
  * shift → large, hand terms), MAD outliers (exact doubled medians,
  * masking resistance vs mean/σ, zero-MAD guard), and sequence
  * support (occurrences vs users, the loop-dominance contrast). */
class PsiMadSeqSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("psi: identical samples score ~0; a shifted sample crosses 0.25") {
    val ref = (0 until 500).map(i => Tuple1((i % 100).toLong)).toDF("v")
    val same = Drift.psi(ref, ref, "v").head()
    assert(same.getAs[Double]("psi") < 0.01, same.toString)
    val shifted = (0 until 500).map(i => Tuple1((i % 100 + 60).toLong)).toDF("v")
    val drift = Drift.psi(ref, shifted, "v").head()
    assert(drift.getAs[Double]("psi") > 0.25, drift.toString)
  }

  test("psi terms match the hand formula with the count-1 floor") {
    // 2 bins: ref 10/10, cur 16/4 -> terms by hand
    val ref = ((0 until 10).map(_ => 1L) ++ (0 until 10).map(_ => 5L))
      .map(Tuple1(_)).toDF("v")
    val cur = ((0 until 16).map(_ => 1L) ++ (0 until 4).map(_ => 5L))
      .map(Tuple1(_)).toDF("v")
    val out = Drift.psi(ref, cur, "v", bins = 2).collect()
    def term(pr: Double, pc: Double) = (pr - pc) * math.log(pr / pc)
    assert(out(0).getAs[Double]("term") ==
      BigDecimal(term(0.5, 0.8)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1).getAs[Double]("term") ==
      BigDecimal(term(0.5, 0.2)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("madOutliers: exact doubled medians; robust where mean/sigma masks") {
    // 29 clean values 100..128 + one wild 10000: sigma inflates to
    // ~1800 so a 3-sigma fence misses a 500 — MAD does not
    val vals = (0 until 29).map(i => (i.toLong, 100L + i)) ++
      Seq((29L, 10000L), (30L, 500L))
    val out = Anomaly.madOutliers(vals.toDF("id", "v"), "id", "v")
      .collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.contains(29L) && ids.contains(30L), ids.toString)
    assert(!ids.exists(_ < 29L))
    // med2 = 2 * median of 31 values (odd -> doubled middle)
    val sorted = vals.map(_._2).sorted
    assert(out.head.getAs[Long]("med2") == 2 * sorted(15))
    // mean/sigma comparison: 500 is within 1 sigma of the mean
    val m = vals.map(_._2).sum.toDouble / vals.length
    val sd = math.sqrt(vals.map(v => (v._2 - m) * (v._2 - m)).sum / vals.length)
    assert(math.abs(500 - m) < sd, s"mean=$m sd=$sd")
  }

  test("madOutliers: zero MAD fails loudly") {
    val vals = (0 until 10).map(i => (i.toLong, 5L)) :+ (10L, 9L)
    val ex = intercept[IllegalArgumentException] {
      Anomaly.madOutliers(vals.toDF("id", "v"), "id", "v").collect()
    }
    assert(ex.getMessage.contains("MAD is 0"))
  }

  test("sequenceSupport separates occurrences from sequence count") {
    // user 1 loops a->b 5 times; users 2..4 do a->b once each
    val rows = (0 until 5).flatMap(i =>
        Seq((1L, i * 2L, "a"), (1L, i * 2L + 1, "b"))) ++
      Seq((2L, 0L, "a"), (2L, 1L, "b"), (3L, 0L, "a"), (3L, 1L, "b"),
        (4L, 0L, "a"), (4L, 1L, "b"), (5L, 0L, "c"))
    val out = Sequences.sequenceSupport(rows.toDF("u", "t", "s"),
      Seq("u"), Seq("t"), "s").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n_occurrences") == 8L) // 5 + 3
    assert(ab.getAs[Long]("support") == 4L)       // users 1,2,3,4
    assert(ab.getAs[Double]("support_frac") == 0.8) // of 5 users
    val ba = out(("b", "a"))
    assert(ba.getAs[Long]("support") == 1L) // only the looper
  }
}
