package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class OutliersSpec extends AnyFunSuite with SparkSuite {

  test("the planted far point ranks first; scores are partitioning-invariant") {
    import spark.implicits._
    // tight cluster at ~0.1 plus one planted outlier at ~0.9
    val rows = (1L to 20L).map(i => (i, "a", Array.fill(4)(0.1f + i * 1e-4f))) :+
      (99L, "a", Array.fill(4)(0.9f))
    val df = rows.toDF("id", "grp", "vec")
    val top = Outliers.topByCentroidDistance(df, "grp", "vec", "id", m = 3)
    val first = top.filter(col("rnk") === 1).select("id").as[Long].head()
    assert(first == 99L)

    val repart = Outliers.topByCentroidDistance(
      df.repartition(7, col("id")), "grp", "vec", "id", m = 3)
    assert(top.orderBy("grp", "rnk").collect().toSeq ==
      repart.orderBy("grp", "rnk").collect().toSeq)
  }

  test("groups are scored independently") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", Array(0.0f, 0.0f)), (2L, "a", Array(0.5f, 0.5f)),
      (3L, "b", Array(0.9f, 0.9f)), (4L, "b", Array(0.89f, 0.9f)))
    val top = Outliers.topByCentroidDistance(rows.toDF("id", "grp", "vec"),
      "grp", "vec", "id", m = 1)
    val byGrp = top.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // symmetric 2-point groups: both ends tie, id breaks the tie
    assert(byGrp == Map("a" -> 1L, "b" -> 3L))
  }

  test("ranking matches the double-precision distance-to-mean ordering") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = (1L to 50L).map(i => (i, "g", Array.fill(8)(rng.nextFloat() - 0.5f)))
    val df = rows.toDF("id", "grp", "vec")
    val got = Outliers.topByCentroidDistance(df, "grp", "vec", "id", m = 50)
      .orderBy("rnk").select("id").as[Long].collect().toSeq
    // reference ordering computed driver-side in doubles on the same grid
    val grid = rows.map { case (id, _, v) =>
      id -> v.map(x => math.floor(x.toDouble * 16384).toLong)
    }
    val n = grid.size
    val sums = grid.map(_._2).transpose.map(_.sum)
    val want = grid.map { case (id, q) =>
      id -> q.zip(sums).map { case (x, s) => val d = n * x - s; d * d }.sum
    }.sortBy { case (id, d2) => (-d2, id) }.map(_._1)
    assert(got == want)
  }

  test("hillPlot: an exact power-law tail plateaus at its alpha") {
    import spark.implicits._
    // v(r) = floor(1e7 / sqrt(r)) is a Pareto(alpha = 2) quantile
    // trace: the Hill plot should sit near 2 across the grid
    val df = (1 to 5000).map(r =>
      math.floor(1e7 / math.sqrt(r.toDouble)).toLong).toDF("v")
    val out = Outliers.hillPlot(df, "v", Seq(20, 50, 100, 200))
      .collect()
    out.foreach { r =>
      val a = r.getAs[Double]("alpha")
      assert(math.abs(a - 2.0) < 0.3,
        s"k=${r.getAs[Long]("k")}: alpha=$a")
    }
    // thresholds decrease with k; x_k is the k-th largest
    val thr = out.map(_.getAs[Long]("threshold"))
    assert(thr.zip(thr.tail).forall { case (a, b) => a >= b })
  }

  test("hillPlot: an all-tied tail yields NULL alpha; refusals") {
    import spark.implicits._
    val tied = (1 to 300).map(_ => 500L).toDF("v")
    val out = Outliers.hillPlot(tied, "v", Seq(10, 50)).collect()
    assert(out.forall(_.isNullAt(3)))
    intercept[IllegalArgumentException](
      Outliers.hillPlot(tied, "v", Seq(50, 10))) // not ascending
    val tiny = (1 to 20).map(_.toLong).toDF("v")
    intercept[IllegalArgumentException](
      Outliers.hillPlot(tiny, "v", Seq(10, 50))) // maxK too deep
  }

  test("hillPlot: partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    val df = (1 to 3000).map(_ => (rnd.nextInt(100000) + 1).toLong)
      .toDF("v")
    val a = Outliers.hillPlot(df.coalesce(1), "v", Seq(10, 40, 160))
      .collect().map(_.toString).toSeq
    val b = Outliers.hillPlot(df.repartition(13), "v", Seq(10, 40, 160))
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
