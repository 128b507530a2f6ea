package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class HybridSearchSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("rrf fuses two lists: shared docs sum both contributions") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rnk")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rnk")
    val out = HybridSearch.rrf(Seq(a, b), "id", "rnk", k = 60)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L) == (1.0 / 61 + 1.0 / 62, 2L))
    assert(out(20L) == (1.0 / 62 + 1.0 / 61, 2L))
    assert(out(30L) == (1.0 / 63, 1L)) // only in list a
    assert(out(40L) == (1.0 / 63, 1L)) // only in list b
  }

  test("rrf ordering: agreement across lists beats a single first place") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rnk")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rnk")
    val top = HybridSearch.rrf(Seq(a, b), "id", "rnk")
      .orderBy($"rrf_score".desc, $"id").as[(Long, Double, Long)].head()
    assert(top._1 == 2L) // ranked in both lists
  }

  test("rrf single list is a monotone transform of rank") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rnk")
    val out = HybridSearch.rrf(Seq(a), "id", "rnk")
      .orderBy($"rrf_score".desc).as[(Long, Double, Long)].collect().map(_._1).toSeq
    assert(out == Seq(1L, 2L, 3L))
  }
}
