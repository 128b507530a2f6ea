package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class BottomKSampleSpec extends AnyFunSuite with SparkSuite {

  private def docs(n: Int, groups: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"g${i % groups}")).toDF("id", "g")
  }

  test("exactly k per group (or the whole group when smaller)") {
    val got = Splits.bottomKSample(docs(100, 4), "id", "g", k = 10)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 10L))
    val small = Splits.bottomKSample(docs(6, 3), "id", "g", k = 10)
    assert(small.count() == 6)
  }

  test("deterministic and partition-invariant") {
    val a = Splits.bottomKSample(docs(200, 5), "id", "g", k = 7, seed = 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Splits.bottomKSample(docs(200, 5).repartition(13), "id", "g", k = 7, seed = 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("different seeds give different samples") {
    val a = Splits.bottomKSample(docs(500, 1), "id", "g", k = 20, seed = 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Splits.bottomKSample(docs(500, 1), "id", "g", k = 20, seed = 2L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a != b)
  }

  test("mergeable: bottomK(A ∪ B) == bottomK(bottomK(A) ∪ bottomK(B))") {
    val d = docs(300, 3)
    val a = d.filter(col("id") < 150)
    val b = d.filter(col("id") >= 150)
    val direct = Splits.bottomKSample(d, "id", "g", k = 9, seed = 5L)
      .select("id").collect().map(_.getLong(0)).toSet
    val partA = Splits.bottomKSample(a, "id", "g", k = 9, seed = 5L).select("id", "g")
    val partB = Splits.bottomKSample(b, "id", "g", k = 9, seed = 5L).select("id", "g")
    val merged = Splits.bottomKSample(partA.union(partB), "id", "g", k = 9, seed = 5L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(direct == merged)
  }

  test("rank prefix property: rank ≤ m is exactly the k=m sample") {
    val d = docs(200, 4)
    val k9 = Splits.bottomKSample(d, "id", "g", k = 9, seed = 2L)
    val prefix = k9.filter(col("sample_rank") <= 4).select("id")
      .collect().map(_.getLong(0)).toSet
    val k4 = Splits.bottomKSample(d, "id", "g", k = 4, seed = 2L).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(prefix == k4)
  }
}
