package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class RfmSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def orders(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("cust", "d", "amt")
      .select(col("cust"), col("d").cast("timestamp").as("ts"), col("amt"))

  test("hand-computed quintiles and segment labels") {
    // 5 customers, strictly ordered on every metric: customer i has
    // recency rank i, frequency i orders, monetary growing with i
    val rows = (1 to 5).flatMap { i =>
      (1 to i).map(j => (i.toLong, f"2001-0$i-01", i * 100.0 + j))
    }
    val out = Rfm.segments(orders(rows: _*), "cust", "ts", "amt",
      "2002-01-01").collect()
    // each customer is alone in its cell; check the extreme cells
    val best = out.find(r => r.getInt(0) == 5 && r.getInt(1) == 5).get
    assert(best.getAs[String]("segment") == "champions")
    assert(best.getAs[Long]("customers") == 1L)
    // customer 5: most recent (2001-05), most orders, highest spend
    val worst = out.find(r => r.getInt(0) == 1 && r.getInt(1) == 1).get
    assert(worst.getAs[String]("segment") == "hibernating")
    assert(out.map(_.getAs[Long]("customers")).sum == 5L)
  }

  test("monetary total is the exact decimal sum of the cell") {
    val rows = Seq((1L, "2001-01-01", 0.1), (1L, "2001-01-02", 0.2),
      (2L, "2001-06-01", 1000.0))
    val out = Rfm.segments(orders(rows: _*), "cust", "ts", "amt",
      "2002-01-01").collect()
    val tot = out.map(_.getAs[Double]("monetary_total")).sum
    assert(tot == 1000.3) // exact decimal accumulation, one double cast
  }

  test("partitioning-invariant") {
    val rows = (1 to 200).map(i =>
      ((i % 37).toLong, f"2001-${i % 12 + 1}%02d-15", (i % 50) * 7.13))
    val df = orders(rows: _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      Rfm.segments(d, "cust", "ts", "amt", "2002-01-01")
        .collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
  }
}
