package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class DriftSpec extends AnyFunSuite with SparkSuite {

  private def tv(rows: Seq[(String, String)]) = {
    import spark.implicits._
    Drift.sourceTv(rows.toDF("source", "text"), "text", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("a source matching the corpus mix has low TV; a divergent one is high") {
    // sources a and b identical mixes; c speaks a different vocabulary
    val rows = Seq.fill(10)(("a", "x y z")) ++ Seq.fill(10)(("b", "x y z")) ++
      Seq.fill(10)(("c", "p q r"))
    val m = tv(rows)
    // corpus = 2/3 {x,y,z}, 1/3 {p,q,r}: TV(a) = TV(b) = 1/3, TV(c) = 2/3
    assert(math.abs(m("a")._2 - 1.0 / 3.0) < 1e-9)
    assert(math.abs(m("b")._2 - 1.0 / 3.0) < 1e-9)
    assert(math.abs(m("c")._2 - 2.0 / 3.0) < 1e-9)
  }

  test("hand-computed TV with partial overlap and absent terms folded in") {
    // s1: 3×x 1×y (T1=4); s2: 1×x 3×z (T2=4); corpus: x4 y1 z3 (T=8)
    // p1 = {x:.75, y:.25}; q = {x:.5, y:.125, z:.375}
    // TV(s1) = ½(|.75−.5| + |.25−.125| + |0−.375|) = ½(.25+.125+.375) = .375
    val rows = Seq(("s1", "x x x y"), ("s2", "x z z z"))
    val m = tv(rows)
    assert(m("s1")._1 == 4L)
    assert(math.abs(m("s1")._2 - 0.375) < 1e-9)
    assert(math.abs(m("s2")._2 - 0.375) < 1e-9)
  }

  test("a source that IS the whole corpus has TV exactly 0") {
    val m = tv(Seq(("only", "a b c a"), ("only", "b c")))
    assert(m("only")._2 == 0.0)
  }

  test("partitioning-invariant (integer numerators)") {
    import spark.implicits._
    val rows = (1 to 300).map(i => (s"s${i % 4}", s"w${i % 11} w${i % 7} w${i % 5}"))
    val a = Drift.sourceTv(rows.toDF("source", "text").coalesce(1), "text", "source")
      .orderBy("source").collect().toSeq
    val b = Drift.sourceTv(rows.toDF("source", "text").repartition(13), "text", "source")
      .orderBy("source").collect().toSeq
    assert(a == b && a.size == 4)
  }
}
