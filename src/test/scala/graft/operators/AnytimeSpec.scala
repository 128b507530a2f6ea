package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import java.sql.Date

class AnytimeSpec extends AnyFunSuite with SparkSuite {

  private def day(d: Int) = Date.valueOf(f"2024-01-$d%02d")

  test("a real sustained effect eventually crosses the boundary; p is monotone") {
    import spark.implicits._
    // 10 days, 200/arm/day; control converts 30%, treatment 60%
    val rows = (1 to 10).flatMap { d =>
      (0 until 200).flatMap { i =>
        Seq((day(d), 0, i % 10 < 3), (day(d), 1, i % 10 < 6))
      }
    }
    val out = Anytime.msprtTrajectory(rows.toDF("day", "arm", "y"),
      "day", "arm", "y").collect()
    val ps = out.map(_.getAs[Double]("p_anytime"))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a },
      "p_anytime must be monotone nonincreasing")
    assert(out.last.getAs[Boolean]("significant"),
      s"final p ${ps.last} should cross 0.05")
  }

  test("a null effect stays well above the boundary at every look") {
    import spark.implicits._
    val rows = (1 to 10).flatMap { d =>
      (0 until 200).flatMap { i =>
        Seq((day(d), 0, i % 10 < 3), (day(d), 1, i % 10 < 3))
      }
    }
    val out = Anytime.msprtTrajectory(rows.toDF("day", "arm", "y"),
      "day", "arm", "y").collect()
    assert(out.forall(!_.getAs[Boolean]("significant")))
    assert(out.last.getAs[Double]("p_anytime") > 0.5)
  }

  test("days before both arms have data are excluded, not divided by zero") {
    import spark.implicits._
    val rows = Seq((day(1), 0, true), (day(1), 0, false),
      (day(2), 1, true), (day(2), 0, false))
    val out = Anytime.msprtTrajectory(rows.toDF("day", "arm", "y"),
      "day", "arm", "y").collect()
    assert(out.map(_.getDate(0).toString).toSeq == Seq("2024-01-02"))
  }
}
