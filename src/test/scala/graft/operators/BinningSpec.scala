package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class BinningSpec extends AnyFunSuite with SparkSuite {

  private def rows(n: Int, groups: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
      (i.toLong, s"g${i % groups}", ((i * 37) % 100).toDouble)).toDF("id", "g", "v")
  }

  test("bin sizes are equal up to one row, per group") {
    val binned = Binning.equalFrequency(rows(103, 2), "g", "v", "id", bins = 5)
    val sizes = binned.groupBy("g", "bin").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
    sizes.groupBy(_._1).foreach { case (_, s) =>
      val cs = s.map(_._2)
      assert(cs.max - cs.min <= 1, cs.mkString(","))
    }
    assert(binned.count() == 103)
  }

  test("bins are value-ordered: every row in bin b has v ≤ every row in bin b+1 (ties by id)") {
    val binned = Binning.equalFrequency(rows(200, 3), "g", "v", "id", bins = 4)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getLong(0), r.getInt(3)))
    binned.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._3)) // (v, id) order
      val binSeq = sorted.map(_._4)
      assert(binSeq.zip(binSeq.tail).forall { case (a, b) => a <= b })
    }
  }

  test("deterministic under repartitioning") {
    val d = rows(300, 4)
    val a = Binning.equalFrequency(d, "g", "v", "id", 7)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Binning.equalFrequency(d.repartition(13), "g", "v", "id", 7)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("winsorize clips exactly into the hand-computed percentile band") {
    import spark.implicits._
    // group g: values 0..100 → p10 = 10.0, p90 = 90.0 (exact interpolation
    // on (n-1)*p = 100*0.1 = rank 10, integer rank → no interpolation)
    val d = (0 to 100).map(i => (i.toLong, "g", i.toLong)).toDF("id", "g", "v")
    val w = Binning.winsorize(d, "g", "v", 0.10, 0.90)
    val rows = w.select("v", "v_w", "w_lo", "w_hi").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.forall { case (_, _, lo, hi) => lo == 10.0 && hi == 90.0 })
    rows.foreach { case (v, vw, _, _) =>
      assert(vw == math.max(10.0, math.min(90.0, v.toDouble)), s"v=$v")
    }
  }

  test("winsorize bands are per-group, untouched interior values pass through") {
    import spark.implicits._
    val d = ((1 to 50).map(i => (i.toLong, "a", i.toLong * 10)) ++
      (1 to 50).map(i => (i.toLong + 100, "b", i.toLong))).toDF("id", "g", "v")
    val w = Binning.winsorize(d, "g", "v", 0.02, 0.98)
    val byG = w.select("g", "w_lo", "w_hi").distinct().collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byG("a")._2 > byG("b")._2) // group a's band is 10× higher
    // interior rows are unchanged
    val interior = w.filter(col("v") > col("w_lo") && col("v") < col("w_hi"))
      .select("v", "v_w").collect()
    interior.foreach(r => assert(r.getLong(0).toDouble == r.getDouble(1)))
  }

  test("approximate path clips against sketch bands within rank-error of exact") {
    import spark.implicits._
    val d = (1 to 2000).map(i => (i.toLong, "g", i.toLong)).toDF("id", "g", "v")
    val ex = Binning.winsorize(d, "g", "v", 0.05, 0.95)
      .select("w_lo", "w_hi").head()
    val ap = Binning.winsorize(d, "g", "v", 0.05, 0.95, exact = false,
      accuracy = 1000).select("w_lo", "w_hi").head()
    // GK rank error ≤ n/accuracy = 2 ranks = 2 value units here
    assert(math.abs(ex.getDouble(0) - ap.getDouble(0)) <= 3.0)
    assert(math.abs(ex.getDouble(1) - ap.getDouble(1)) <= 3.0)
  }

  test("boundaries: lo/hi nest monotonically and counts sum to the group") {
    val binned = Binning.equalFrequency(rows(150, 2), "g", "v", "id", 6)
    val bd = Binning.boundaries(binned, "g", "v")
      .orderBy("g", "bin").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    bd.groupBy(_._1).foreach { case (_, rs) =>
      val s = rs.sortBy(_._2)
      assert(s.map(_._3).sum == 75L)
      s.foreach { case (_, _, _, lo, hi) => assert(lo <= hi) }
      // hi of bin b ≤ lo of bin b+2 can still interleave on ties; the
      // non-strict guarantee is hi(b) ≤ hi(b+1) and lo(b) ≤ lo(b+1)
      assert(s.map(_._4).zip(s.map(_._4).tail).forall { case (a, b) => a <= b })
      assert(s.map(_._5).zip(s.map(_._5).tail).forall { case (a, b) => a <= b })
    }
  }

  test("gridQuantileBoundaries: hand-computed quintiles on 1..100") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v")
    val b = Binning.gridQuantileBoundaries(df, "v", 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // boundary q = smallest v with cumcount >= ceil(q*100/5) = 20q
    assert(b == Map(1 -> 20L, 2 -> 40L, 3 -> 60L, 4 -> 80L))
  }

  test("gridQuantileBoundaries + withGridBin: equal-frequency on duplicates-heavy data") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => i % 10).toDF("v") // 10 distinct values
    val bins = Binning.withGridBin(df, "v",
      Binning.gridQuantileBoundaries(df, "v", 5))
    val byBin = bins.groupBy("v_bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byBin.values.sum == 1000L)
    assert(byBin.keySet == Set(1, 2, 3, 4, 5))
    byBin.values.foreach(n => assert(n == 200L)) // 2 values per bin
  }

  test("gridQuantileBoundaries invariant to partitioning; bins cover all rows") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i * 37) % 101).toDF("v")
    val a = Binning.gridQuantileBoundaries(df, "v", 4)
      .orderBy("q").collect().map(_.toSeq).toSeq
    val b = Binning.gridQuantileBoundaries(df.repartition(13), "v", 4)
      .orderBy("q").collect().map(_.toSeq).toSeq
    assert(a == b)
    val binned = Binning.withGridBin(df, "v", Binning.gridQuantileBoundaries(df, "v", 4))
    assert(binned.filter(col("v_bin") < 1 || col("v_bin") > 4).count() == 0)
  }

  test("informationValue hand-computed: IV = (2/3)·ln2 on the planted split") {
    import spark.implicits._
    // bin1 = {1,2,3}: 2 pos / 1 neg; bin2 = {4,5,6}: 1 pos / 2 neg
    val rows = Seq((1L, true), (2L, true), (3L, false),
      (4L, true), (5L, false), (6L, false)).toDF("s", "y")
    val out = Binning.informationValue(rows.repartition(4), "y", "s", 2)
      .collect()
    assert(out.length == 2)
    assert(math.abs(out(0).getAs[Double]("woe") - math.log(2.0)) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("woe") + math.log(2.0)) < 1e-6)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("iv") - 2.0 / 3 * math.log(2.0))
        < 1e-5)
    }
  }

  test("informationValue: an uninformative score reads IV = 0") {
    import spark.implicits._
    val rows = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("s", "y")
    val out = Binning.informationValue(rows, "y", "s", 2).collect()
    assert(out.forall(_.getAs[Double]("iv") == 0.0))
    assert(out.forall(_.getAs[Double]("woe") == 0.0))
  }

  test("informationValue refuses an empty-class bin and a one-class label") {
    import spark.implicits._
    val sep = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("s", "y")
    assert(intercept[IllegalArgumentException] {
      Binning.informationValue(sep, "y", "s", 2)
    }.getMessage.contains("empty class"))
    val onec = Seq((1L, true), (2L, true), (3L, true), (4L, true))
      .toDF("s", "y")
    assert(intercept[IllegalArgumentException] {
      Binning.informationValue(onec, "y", "s", 2)
    }.getMessage.contains("empty class"))
  }
}
