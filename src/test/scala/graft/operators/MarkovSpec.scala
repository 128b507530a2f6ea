package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import java.sql.Timestamp

class MarkovSpec extends AnyFunSuite with SparkSuite {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("hand-computed transition matrix with row normalisation") {
    import spark.implicits._
    // u1: a->b->a ; u2: a->a
    val rows = Seq((1L, "a", ts(1), 1L), (1L, "b", ts(2), 2L),
      (1L, "a", ts(3), 3L), (2L, "a", ts(1), 4L), (2L, "a", ts(2), 5L))
    val out = Markov.transitions(
      rows.toDF("user_id", "state", "ts", "eid"),
      "user_id", "state", "ts", "eid")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("a", "b")) == ((1L, 2L, 0.5)))
    assert(out(("a", "a")) == ((1L, 2L, 0.5)))
    assert(out(("b", "a")) == ((1L, 1L, 1.0)))
    assert(out.size == 3)
  }

  test("transitions never cross entities; ties break on the tie column") {
    import spark.implicits._
    // same timestamp: order by eid decides b->c not c->b
    val rows = Seq((1L, "b", ts(1), 1L), (1L, "c", ts(1), 2L),
      (2L, "x", ts(9), 3L))
    val out = Markov.transitions(
      rows.toDF("user_id", "state", "ts", "eid"),
      "user_id", "state", "ts", "eid").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "b" && out(0).getString(1) == "c")
  }
}
