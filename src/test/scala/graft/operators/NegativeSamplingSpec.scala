package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class NegativeSamplingSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private val edges = (for (s <- 1L to 20L; p <- 1L to 50L if (s * 7 + p) % 3 == 0)
    yield (s, p)).toDF("s", "p")

  test("no negative is an observed edge; positives are exactly the edge set") {
    val out = NegativeSampling.labeledPairs(edges, "s", "p", k = 5, buckets = 64)
    val pos = out.filter(col("label") === 1).select("left", "right")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val neg = out.filter(col("label") === 0).select("left", "right")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = edges.distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pos == expect)
    assert(neg.intersect(expect).isEmpty)
    assert(neg.nonEmpty)
  }

  test("at most k negatives per left node; partners come from the right pool") {
    val out = NegativeSampling.labeledPairs(edges, "s", "p", k = 5, buckets = 64)
    val perLeft = out.filter(col("label") === 0).groupBy("left").count().collect()
    perLeft.foreach(r => assert(r.getLong(1) <= 5))
    val rightPool = edges.select("p").distinct()
      .collect().map(_.getLong(0)).toSet
    out.filter(col("label") === 0).select("right").collect()
      .foreach(r => assert(rightPool.contains(r.getLong(0))))
  }

  test("deterministic across partitionings; a new seed rotates the draw") {
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      NegativeSampling.labeledPairs(df, "s", "p", k = 5, buckets = 64, seed = seed)
        .orderBy("label", "left", "right").collect().map(_.toSeq).toSeq
    assert(run(edges, 0L) == run(edges.repartition(13), 0L))
    val a = run(edges, 0L).filter(_(2) == 0)
    val b = run(edges, 99L).filter(_(2) == 0)
    assert(a != b) // different negatives under a different seed
  }

  test("bad k fails loudly") {
    intercept[IllegalArgumentException] {
      NegativeSampling.labeledPairs(edges, "s", "p", k = 0)
    }
    intercept[IllegalArgumentException] {
      NegativeSampling.labeledPairs(edges, "s", "p", k = 10, buckets = 5)
    }
  }
}
