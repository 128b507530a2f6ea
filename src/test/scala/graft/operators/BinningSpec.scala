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
}
