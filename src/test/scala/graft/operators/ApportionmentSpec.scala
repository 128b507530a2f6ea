package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ApportionmentSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("hand-computed: the classic largest-remainder example") {
    // weights 47, 33, 20 over budget 10: quotas 4.7, 3.3, 2.0
    // bases 4, 3, 2 = 9; one leftover seat -> largest remainder (a: .7)
    val df = Seq(("a", 47L), ("b", 33L), ("c", 20L)).toDF("g", "w")
    val got = Apportionment.hamilton(df, "g", "w", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got == Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
  }

  test("allocations always sum exactly to the budget") {
    val df = (1 to 37).map(i => (s"g$i", (i * 13 % 29 + 1).toLong)).toDF("g", "w")
    Seq(0L, 1L, 100L, 997L).foreach { budget =>
      val s = Apportionment.hamilton(df, "g", "w", budget)
        .agg(sum(col("alloc"))).head().getLong(0)
      assert(s == budget, s"budget=$budget")
    }
  }

  test("remainder ties break by group key, deterministically") {
    // equal weights, budget not divisible: 3 groups x w=1, budget 4
    // bases 1 each; 1 leftover -> equal remainders 1/3 -> smallest key
    val df = Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("g", "w")
    val got = Apportionment.hamilton(df, "g", "w", 4L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got == Map("x" -> 2L, "y" -> 1L, "z" -> 1L))
  }

  test("zero-weight groups get zero; result invariant to partitioning") {
    val df = Seq(("a", 0L), ("b", 10L), ("c", 30L)).toDF("g", "w")
    val got = Apportionment.hamilton(df, "g", "w", 8L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got("a") == 0L && got.values.sum == 8L)
    val big = (1 to 100).map(i => (s"g$i", (i % 11 + 1).toLong)).toDF("g", "w")
    val one = Apportionment.hamilton(big, "g", "w", 55L)
      .orderBy("g").collect().map(_.toSeq).toSeq
    val two = Apportionment.hamilton(big.repartition(13), "g", "w", 55L)
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(one == two)
  }

  test("bad inputs fail loudly: duplicates, all-zero weight, overflow") {
    intercept[IllegalArgumentException] {
      Apportionment.hamilton(Seq(("a", 1L), ("a", 2L)).toDF("g", "w"), "g", "w", 5L)
    }
    intercept[IllegalArgumentException] {
      Apportionment.hamilton(Seq(("a", 0L)).toDF("g", "w"), "g", "w", 5L)
    }
    intercept[IllegalArgumentException] {
      Apportionment.hamilton(Seq(("a", Long.MaxValue / 2)).toDF("g", "w"),
        "g", "w", 1000000L)
    }
  }

  test("NULL weights fail loudly (would silently break the budget sum)") {
    val df = Seq(("a", java.lang.Long.valueOf(3L)),
      ("b", null.asInstanceOf[java.lang.Long])).toDF("g", "w")
    val e = intercept[IllegalArgumentException] {
      Apportionment.hamilton(df, "g", "w", 10L)
    }
    assert(e.getMessage.contains("NULL"))
  }
}
