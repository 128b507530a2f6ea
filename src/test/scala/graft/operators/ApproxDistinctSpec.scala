package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

/** Accuracy gates for the sketch queries (q28/q73 have no SQL oracle —
  * sketches are engine-specific — so the tolerance checks live here). */
class ApproxDistinctSpec extends AnyFunSuite with SparkSuite {

  test("approx_count_distinct within 5% of exact") {
    val li = t(spark, sf, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("percentile_approx within 1% relative error of the exact quantile") {
    val li = t(spark, sf, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("approx"),
        expr("percentile(l_extendedprice, array(0.5, 0.95))").as("exact"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[Double](1); val e = r.getSeq[Double](2)
      a.zip(e).foreach { case (av, ev) =>
        assert(math.abs(av - ev) / ev < 0.01,
          s"${r.getString(0)}: approx $av vs exact $ev")
      }
    }
  }
}
