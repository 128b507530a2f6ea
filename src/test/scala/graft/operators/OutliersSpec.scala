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
}
