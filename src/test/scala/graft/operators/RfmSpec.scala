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

  test("migration: snapshot A must not see post-cutoff orders") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // 20 customers, every one orders monthly through 2020; half STOP
    // in July — at the 2021 snapshot the stoppers must have migrated
    // down while the full-year customers hold
    val orders = (1L to 20L).flatMap { c =>
      val months = if (c <= 10) 1 to 12 else 1 to 6
      months.map(m => (c, ts(f"2020-$m%02d-15"), 100.0))
    }.toDF("c", "dt", "amt")
    val out = Rfm.migration(orders, "c", "dt", "amt",
      "2020-07-01", "2021-01-01")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("customers")))
    // every (from, to) cell count must be reproducible and total 20
    assert(out.map(_._3).sum == 20L)
    // stoppers: no orders after June → recency collapses at snapshot B;
    // none of them may land in a recency-gated segment (recent/champions)
    val toSegCounts = out.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    assert(toSegCounts.getOrElse("recent", 0L) +
      toSegCounts.getOrElse("champions", 0L) <= 10L)
  }

  test("migration: partition-invariant and row shares sum to 1 per from-segment") {
    import spark.implicits._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(71)
    val orders = (1 to 400).map { i =>
      (rnd.nextInt(40).toLong + 1,
        Timestamp.valueOf(f"${2019 + rnd.nextInt(3)}%d-${rnd.nextInt(12) + 1}%02d-10 00:00:00"),
        rnd.nextInt(500) + 1.0)
    }.toDF("c", "dt", "amt")
    val a = Rfm.migration(orders, "c", "dt", "amt", "2020-06-01",
      "2022-01-01").collect()
    val b = Rfm.migration(orders.repartition(9), "c", "dt", "amt",
      "2020-06-01", "2022-01-01").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("row_share")).sum - 1.0)
        < 1e-5)
    }
  }
}
