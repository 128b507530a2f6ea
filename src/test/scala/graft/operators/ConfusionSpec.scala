package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ConfusionSpec extends AnyFunSuite with SparkSuite {

  test("hand-computed 3-class confusion with per-class F1 and macro") {
    import spark.implicits._
    // truth a: 3 rows (2 pred a, 1 pred b); truth b: 2 rows (both b);
    // truth c: 1 row pred a
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "a"))
    val out = Confusion.multiclass(rows.toDF("t", "p"), "t", "p")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 3 && a.getLong(2) == 2 &&
      a.getLong(3) == 1 && a.getLong(4) == 1)
    // precision a = 2/3, recall = 2/3, f1 = 2/3
    assert(math.abs(a.getAs[Double]("precision") - 2.0 / 3.0) < 1e-6)
    assert(math.abs(a.getAs[Double]("f1") - 2.0 / 3.0) < 1e-6)
    val c = out("c")
    assert(c.getAs[Double]("f1") == 0.0, "never-predicted class f1 = 0")
    // accuracy = 4/6; macro over truth classes a, b, c
    assert(math.abs(a.getAs[Double]("accuracy") - 4.0 / 6.0) < 1e-6)
    val f1b = out("b").getAs[Double]("f1")
    val macroF1 = (2.0 / 3.0 + f1b + 0.0) / 3.0
    assert(math.abs(a.getAs[Double]("macro_f1") - macroF1) < 1e-5)
  }

  test("a perfect labeler reads 1.0 everywhere") {
    import spark.implicits._
    val rows = Seq(("x", "x"), ("y", "y"), ("y", "y"))
    val out = Confusion.multiclass(rows.toDF("t", "p"), "t", "p").collect()
    out.foreach { r =>
      assert(r.getAs[Double]("f1") == 1.0 &&
        r.getAs[Double]("accuracy") == 1.0 &&
        r.getAs[Double]("macro_f1") == 1.0)
    }
  }
}
