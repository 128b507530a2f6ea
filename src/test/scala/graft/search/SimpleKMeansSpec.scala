package graft.search

import org.apache.spark.sql.functions.format_string
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** The driver-local Lloyd path (bounded sample + integral ids) must be
  * numerically indistinguishable from the distributed path — same init,
  * same first-max assignment, same mean→normalize→float32 update. The
  * float32 per-iteration rounding is what absorbs summation-order
  * differences (the same invariant the q33/q103 SQL-replay oracles
  * lean on across engines). */
class SimpleKMeansSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def corpus(n: Int, dims: Int) =
    (0 until n).map { i =>
      // three planted directions + deterministic jitter
      val base = i % 3
      (i.toLong, Array.tabulate(dims)(p =>
        (if (p % 3 == base) 1.0f else 0.05f) + ((i * 31 + p * 7) % 13) / 100.0f).toSeq)
    }.toDF("id", "vec")

  test("local sampled path == distributed full path when the sample covers the corpus") {
    val df = corpus(120, 16)
    val local = SimpleKMeans.fit(df, "vec", "id", k = 5, iters = 3,
      maxTrainPoints = 1000) // > corpus → same point set, local path
    val dist = SimpleKMeans.fit(df, "vec", "id", k = 5, iters = 3,
      maxTrainPoints = 0)    // distributed full-corpus path
    assert(local.length == dist.length)
    for (c <- local.indices) {
      assert(local(c).length == dist(c).length, s"centroid $c dims")
      for (p <- local(c).indices)
        assert(local(c)(p) == dist(c)(p),
          s"centroid $c dim $p: local=${local(c)(p)} dist=${dist(c)(p)}")
    }
  }

  test("local path is deterministic across input partitioning") {
    val df = corpus(200, 8)
    val a = SimpleKMeans.fit(df, "vec", "id", 4, 3, maxTrainPoints = 64)
    val b = SimpleKMeans.fit(df.repartition(7), "vec", "id", 4, 3,
      maxTrainPoints = 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("local (integral-id) and distributed (string-id) SAMPLED paths agree") {
    // the r18 advisor's scenario: the SAME data reaches fitLocal via
    // integral ids but the distributed sampled Lloyd via any other id
    // type — the two accumulation orders (sample order vs partition
    // order) must wash out in the per-iteration float32 rounding, and
    // this pins it on a corpus bigger than the sample
    val longIds = corpus(300, 12)
    val strIds = longIds.select(
      format_string("%04d", $"id").as("id"), $"vec") // zero-padded: string
    val local = SimpleKMeans.fit(longIds, "vec", "id", k = 6, iters = 4,
      maxTrainPoints = 96)
    val dist = SimpleKMeans.fit(strIds.repartition(5), "vec", "id", k = 6,
      iters = 4, maxTrainPoints = 96)
    assert(local.map(_.toSeq).toSeq == dist.map(_.toSeq).toSeq)
  }

  test("both paths agree on a NEAR-TIE corpus (adversarial argmax)") {
    // many vectors nearly equidistant between two planted directions:
    // a summation-order-sensitive argmax or a sum on a float32 rounding
    // boundary would flip assignments between the paths
    val df = (0 until 240).map { i =>
      val a = 0.5f + ((i % 7) - 3) * 1e-7f // hugs the tie point
      (i.toLong, Seq(a, 1.0f - a, 0.25f + (i % 11) * 1e-6f, 0.75f))
    }.toDF("id", "vec")
    val local = SimpleKMeans.fit(df, "vec", "id", k = 4, iters = 5,
      maxTrainPoints = 500)
    val strDf = df.select(format_string("%04d", $"id").as("id"), $"vec")
    val dist = SimpleKMeans.fit(strDf.repartition(7), "vec", "id", k = 4,
      iters = 5, maxTrainPoints = 500)
    assert(local.map(_.toSeq).toSeq == dist.map(_.toSeq).toSeq)
  }

  test("centroids live on the unit sphere; empty-cluster rows survive") {
    // k = 4 but only 3 distinct directions with heavy duplication: at
    // least one cluster can end up empty and must keep a valid centroid
    val df = (0 until 90).map { i =>
      (i.toLong, Array.tabulate(6)(p => if (p == i % 3) 1.0f else 0.0f).toSeq)
    }.toDF("id", "vec")
    val cs = SimpleKMeans.fit(df, "vec", "id", k = 4, iters = 2,
      maxTrainPoints = 500)
    assert(cs.length == 4)
    cs.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6 || n == 0.0, s"norm $n")
    }
  }
}
