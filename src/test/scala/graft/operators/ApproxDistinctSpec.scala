package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

/** Accuracy gate for the HLL++ sketch query (q28 has no SQL oracle —
  * sketches are engine-specific — so the tolerance check lives here). */
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
}
