package graft.search

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
