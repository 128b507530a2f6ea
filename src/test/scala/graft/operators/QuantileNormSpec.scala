package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class QuantileNormSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)]) =
    QuantileNorm.toPooled(rows.toDF("id", "g", "v"), "g", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

  test("hand-computed mapping: lenient and strict scales land on pooled values") {
    // g1 = [10, 20], g2 = [100, 200]; pooled sorted = [10, 20, 100, 200]
    // rank r of ng=2 -> pooled rank (r-1)*3/1 + 1 -> r=1 -> 1, r=2 -> 4
    val m = run(Seq((1L, "g1", 10L), (2L, "g1", 20L),
      (3L, "g2", 100L), (4L, "g2", 200L)))
    assert(m == Map(1L -> 10L, 2L -> 200L, 3L -> 10L, 4L -> 200L))
  }

  test("a group identical to the pooled distribution maps onto itself") {
    val vals = Seq(3L, 7L, 11L, 19L, 23L)
    val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, "only", v) }
    val m = run(rows)
    rows.foreach { case (id, _, v) => assert(m(id) == v) }
  }

  test("singleton group maps to the pooled median") {
    // pooled = [1, 2, 3, 4, 9]: N=5, median rank (5-1)/2+1 = 3 -> value 3
    val m = run(Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 4L), (4L, "a", 9L),
      (5L, "solo", 3L)))
    assert(m(5L) == 3L)
  }

  test("monotone within group; output multiset ~ pooled quantiles; partition-invariant") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 400L).map(i =>
      (i, s"g${i % 4}", (rnd.nextInt(50) + (i % 4) * 30).toLong))
    val df = rows.toDF("id", "g", "v")
    val a = QuantileNorm.toPooled(df.coalesce(1), "g", "v", "id")
      .orderBy("id").collect().toSeq
    val b = QuantileNorm.toPooled(df.repartition(13), "g", "v", "id")
      .orderBy("id").collect().toSeq
    assert(a == b)
    // monotone: within a group, higher raw value -> >= normalized value
    val byG = a.map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    for ((_, rs) <- byG) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.sliding(2).forall {
        case Seq(x, y) => x._3 <= y._3
        case _ => true
      })
    }
    // after normalization the group MEDIANS converge (the calibration point)
    val meds = byG.view.mapValues { rs =>
      val s = rs.map(_._3).sorted; s(s.size / 2)
    }.values.toSeq
    val pooled = rows.map(_._3).sorted.apply(rows.size / 2)
    meds.foreach(md => assert(math.abs(md - pooled) <= 5,
      s"group median $md far from pooled $pooled"))
  }
}
