package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class SeasonalSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:30:00")

  // columns: hour, v, trend, seasonal, remainder

  test("constant series: trend = level, seasonal = 0, remainder = 0 exactly") {
    val rows = for (d <- 1 to 3; h <- 0 to 23) yield (ts(d, h), 7.0)
    val out = Seasonal.decompose(rows.toDF("ts", "value"), "ts", "value").collect()
    out.foreach { r =>
      if (!r.isNullAt(2)) assert(r.getDouble(2) == 7.0)
      if (!r.isNullAt(3)) assert(r.getDouble(3) == 0.0)
      if (!r.isNullAt(4)) assert(r.getDouble(4) == 0.0)
    }
  }

  test("pure linear trend: trend recovers it exactly, seasonal and remainder are 0") {
    // v(hour_index) = index: the centered 25-point MA of a line IS the
    // center value, the scaled detrended numerator 25·v − Σwindow is
    // EXACTLY zero in decimal, so seasonal and remainder are exactly 0
    val rows = (0 until 72).map(i => (ts(1 + i / 24, i % 24), i.toDouble))
    val out = Seasonal.decompose(rows.toDF("ts", "value"), "ts", "value")
      .orderBy("hour").collect()
    out.zipWithIndex.foreach { case (r, i) =>
      if (!r.isNullAt(2)) {
        assert(r.getDouble(2) == i.toDouble)   // trend = the line
        assert(r.getDouble(3) == 0.0)          // seasonal exactly 0
        assert(r.getDouble(4) == 0.0)          // remainder exactly 0
      }
    }
  }

  test("trend and remainder are NULL exactly at the 12-row series edges") {
    val rows = for (d <- 1 to 2; h <- 0 to 23) yield (ts(d, h), 1.0)
    val out = Seasonal.decompose(rows.toDF("ts", "value"), "ts", "value").collect()
    assert(out.count(_.isNullAt(2)) == 24) // 12 per edge of the 48-row series
    assert(out.count(_.isNullAt(4)) == 24)
    // every hour-of-day position has one interior row: seasonal total
    assert(out.count(_.isNullAt(3)) == 0)
  }

  test("multiple events per hour sum exactly; NULL ts excluded") {
    val rows = Seq((ts(1, 0), 1.11), (ts(1, 0), 2.22), (ts(1, 1), 3.0),
      (null.asInstanceOf[Timestamp], 99.0))
    val out = Seasonal.decompose(rows.toDF("ts", "value"), "ts", "value")
      .orderBy("hour").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(1) == 3.33)
  }

  test("invariant to partitioning (decimal accumulation)") {
    val rows = for (d <- 1 to 5; h <- 0 to 23; k <- 1 to 3)
      yield (ts(d, h), (d * h * k % 17) + 0.25)
    val df = rows.toDF("ts", "value")
    val a = Seasonal.decompose(df, "ts", "value").collect().map(_.toSeq).toSeq
    val b = Seasonal.decompose(df.repartition(11), "ts", "value").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("non-divisor-of-24 periods use epoch-hour positions, not hour-of-day") {
    // v has exact period 7 in HOURS: v(i) = 10 * (i % 7). With epoch-hour
    // positions the detrended series at each position is constant, so
    // remainder must be exactly 0 everywhere the trend exists. The old
    // hour-of-day labeling collapses 7 to a day-boundary-broken cycle
    // and leaves a nonzero remainder.
    val rows = (0 until 24 * 7).map(i => (ts(1 + i / 24, i % 24), 10.0 * (i % 7)))
    val out = Seasonal.decompose(rows.toDF("ts", "value"), "ts", "value",
      periodHours = 7, halfWindow = 7).collect()
    assert(out.exists(!_.isNullAt(4)))
    out.foreach { r =>
      if (!r.isNullAt(4)) assert(math.abs(r.getDouble(4)) < 1e-9,
        s"remainder should vanish for an exactly 7h-periodic series: $r")
    }
  }

  test("weekly period (168) produces positions beyond 23") {
    // 2 weeks of hourly data with a spike at epoch-week-hour 30: the
    // seasonal term must carry the spike at that position only —
    // impossible under hour-of-day labeling (position 30 cannot exist).
    val rows = (0 until 24 * 28).map { i =>
      val spike = if (i % 168 == 30) 1000.0 else 0.0
      (ts(1 + i / 24, i % 24), spike)
    }
    val out = Seasonal.decompose(rows.toDF("ts", "value"), "ts", "value",
        periodHours = 168, halfWindow = 84)
      .orderBy("hour").collect()
    val mid = out.filter(!_.isNullAt(3))
    assert(mid.nonEmpty)
    // seasonal at spike positions is far above the rest
    val byIdx = out.zipWithIndex
    byIdx.foreach { case (r, i) =>
      if (!r.isNullAt(3)) {
        if (i % 168 == 30) assert(r.getDouble(3) > 900.0)
        else assert(r.getDouble(3) < 100.0)
      }
    }
  }

  test("strength: a flat series has zero trend strength; a strong daily cycle reads high F_seasonal") {
    import spark.implicits._
    import java.sql.Timestamp
    // 10 days of hourly points with a clean 24h cycle + tiny noise
    val rnd = new scala.util.Random(3)
    val rows = (0 until 240).map { h =>
      val ts = Timestamp.valueOf(f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:00:00")
      (ts, 100.0 + 50.0 * math.sin(2 * math.Pi * (h % 24) / 24.0) +
        rnd.nextGaussian() * 0.5)
    }
    val r = Seasonal.strength(rows.toDF("ts", "v"), "ts", "v").head()
    assert(r.getAs[Double]("f_seasonal") > 0.9,
      s"f_seasonal ${r.getAs[Double]("f_seasonal")}")
  }

  test("strength: pure noise reads low on both axes") {
    import spark.implicits._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(7)
    val rows = (0 until 240).map { h =>
      val ts = Timestamp.valueOf(f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:00:00")
      (ts, rnd.nextGaussian() * 10.0)
    }
    val r = Seasonal.strength(rows.toDF("ts", "v"), "ts", "v").head()
    assert(r.getAs[Double]("f_seasonal") < 0.5)
    assert(r.getAs[Double]("f_trend") < 0.5)
  }
}
