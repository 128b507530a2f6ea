package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class WeightedSampleSpec extends AnyFunSuite with SparkSuite {

  private def docs(n: Int, groups: Int, w: Long => Long) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"g${i % groups}", w(i.toLong)))
      .toDF("id", "g", "wt")
  }

  test("exactly k per group; zero/null weights excluded") {
    import spark.implicits._
    val d = (0 until 100).map(i =>
      (i.toLong, "g", if (i % 10 == 0) None else Some(5L)))
      .toDF("id", "g", "wt")
    val got = Splits.weightedBottomKSample(d, "id", "wt", "g", k = 20)
      .select("id").collect().map(_.getLong(0))
    assert(got.length == 20)
    assert(got.forall(_ % 10 != 0)) // null-weight rows never sampled
    val zero = docs(50, 1, i => if (i < 25) 0L else 3L)
    val z = Splits.weightedBottomKSample(zero, "id", "wt", "g", k = 50)
      .select("id").collect().map(_.getLong(0))
    assert(z.length == 25 && z.forall(_ >= 25))
  }

  test("priority replays the documented integer arithmetic exactly") {
    val d = docs(64, 2, i => i % 7 + 1)
    val got = Splits.weightedBottomKSample(d, "id", "wt", "g", k = 64, seed = 9L)
      .select("id", "wt", "sample_prio").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (id, wt, prio) =>
      val mixed = (id % 2147483648L) ^ (9L % 2147483648L)
      val u = (mixed * 2654435761L) % 4294967296L
      assert(prio == (u * 1048576L) / math.min(wt, 1073741824L),
        s"id=$id wt=$wt")
    }
  }

  test("deterministic and partition-invariant") {
    val d = docs(300, 3, i => (i % 13) + 1)
    val a = Splits.weightedBottomKSample(d, "id", "wt", "g", k = 11, seed = 4L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Splits.weightedBottomKSample(d.repartition(17), "id", "wt", "g",
      k = 11, seed = 4L).select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("mergeable: weighted bottomK(A ∪ B) == bottomK of merged per-part samples") {
    val d = docs(400, 2, i => (i % 29) + 1)
    val a = d.filter(col("id") < 200)
    val b = d.filter(col("id") >= 200)
    val direct = Splits.weightedBottomKSample(d, "id", "wt", "g", k = 13, seed = 7L)
      .select("id").collect().map(_.getLong(0)).toSet
    val pa = Splits.weightedBottomKSample(a, "id", "wt", "g", k = 13, seed = 7L)
      .select("id", "g", "wt")
    val pb = Splits.weightedBottomKSample(b, "id", "wt", "g", k = 13, seed = 7L)
      .select("id", "g", "wt")
    val merged = Splits.weightedBottomKSample(pa.union(pb), "id", "wt", "g",
      k = 13, seed = 7L).select("id").collect().map(_.getLong(0)).toSet
    assert(direct == merged)
  }

  test("inclusion tracks weight: heavy rows sampled far more often across seeds") {
    // 100 rows: ids 0-49 weight 1, ids 50-99 weight 20; k=10 per seed
    val d = docs(100, 1, i => if (i < 50) 1L else 20L)
    val picks = (1L to 40L).flatMap { s =>
      Splits.weightedBottomKSample(d, "id", "wt", "g", k = 10, seed = s)
        .select("id").collect().map(_.getLong(0))
    }
    val heavy = picks.count(_ >= 50).toDouble / picks.size
    assert(heavy > 0.75, s"heavy share $heavy") // ∝-weight would be ~0.95
  }
}
