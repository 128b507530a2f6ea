package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ShiftSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("hand-computed deciles of a uniform grid and a constant shift") {
    // ref = 1..100, cur = ref + 7: every decile shifts by exactly 7
    val ref = (1L to 100L).toDF("v")
    val cur = (1L to 100L).map(_ + 7L).toDF("v")
    val out = Shift.deciles(ref, cur, "v").collect()
    assert(out.length == 9)
    out.foreach { r =>
      val k = r.getLong(0)
      // type-1: q_k = min v with cum >= ceil(k*100/10) = 10k
      assert(r.getLong(1) == 10L * k, s"q_ref@$k")
      assert(r.getLong(2) == 10L * k + 7L, s"q_cur@$k")
      assert(r.getLong(3) == 7L)
    }
  }

  test("ties and uneven sizes follow the exact ceil-rank rule") {
    // ref = {1,1,1,2}: n=4; q1..q7 need cum>=ceil(k*4/10): k<=7 -> rank<=3 -> 1
    // q8,q9 need cum >= 4 -> 2
    val ref = Seq(1L, 1L, 1L, 2L).toDF("v")
    val cur = Seq(5L, 6L, 7L).toDF("v")
    val out = Shift.deciles(ref, cur, "v").collect()
    val qref = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 7L).forall(k => qref(k) == 1L))
    assert(qref(8L) == 2L && qref(9L) == 2L)
    // cur n=3: ceil(k*3/10): k<=3 -> 1 -> 5; k<=6 -> 2 -> 6; k<=9 -> 3 -> 7
    val qcur = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 3L).forall(k => qcur(k) == 5L))
    assert((4L to 6L).forall(k => qcur(k) == 6L))
    assert((7L to 9L).forall(k => qcur(k) == 7L))
  }

  test("partitioning-invariant; refuses floats and unbounded grids") {
    val ref = (1 to 500).map(i => (i % 83).toLong).toDF("v")
    val cur = (1 to 400).map(i => (i % 61).toLong).toDF("v")
    def run(a: org.apache.spark.sql.DataFrame,
            b: org.apache.spark.sql.DataFrame) =
      Shift.deciles(a, b, "v").collect().map(_.toString).toSeq
    assert(run(ref.coalesce(1), cur.coalesce(1)) ==
      run(ref.repartition(7), cur.repartition(5)))
    intercept[IllegalArgumentException] {
      Shift.deciles((1 to 5).map(_ * 1.5).toDF("v"),
        (1 to 5).map(_ * 1.5).toDF("v"), "v")
    }
    intercept[IllegalArgumentException] {
      Shift.deciles(spark.range(70000).toDF("v"),
        spark.range(70000).toDF("v"), "v")
    }
  }
}
