package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** q435's loop detector, proven on planted degenerate tails the random
  * synthetic corpus cannot produce: phrase cycles of every period in
  * range, smallest-period preference, the two-full-cycles requirement,
  * the 30-token tail window, and clean text staying clean. The gate's
  * DuckDB oracle replays the identical CASE chain relationally. */
class LoopDetectionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Inline replica of the q435 expression stack (the gate keeps its
    * query private; the algebra under test is the expression shape). */
  private def detect(docs: Seq[(Long, String)]): Map[Long, (Int, Boolean)] = {
    val w = graft.functions.TextFunctions.words(col("text"))
    val tail = when(size(w) >= 30, slice(w, -30, 30)).otherwise(w)
    def periodic(p: Int) = {
      val n = size(col("__tl"))
      (n >= 2 * p) && forall(
        sequence(lit(1), n - lit(p), lit(1)),
        i => element_at(col("__tl"), i) === element_at(col("__tl"), i + p))
    }
    val period = (1 to 10).foldRight(lit(0)) { (p, acc) =>
      when(periodic(p), lit(p)).otherwise(acc)
    }
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), tail.as("__tl"))
      .filter(size(col("__tl")) >= 2)
      .select(col("doc_id"), period.as("period"),
        (period >= 1).as("deg"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
  }

  test("planted cycles: every period 1..10 detected at its smallest p") {
    val docs = (1 to 10).map { p =>
      val cycle = (0 until p).map(i => s"w$i").mkString(" ")
      (p.toLong, (cycle + " ") * (30 / p + 2))
    }
    val out = detect(docs)
    for (p <- 1 to 10) {
      assert(out(p.toLong)._1 == p, s"period $p")
      assert(out(p.toLong)._2)
    }
  }

  test("a p=2 cycle reports 2, not its multiples") {
    val out = detect(Seq((1L, ("tick tock " * 20).trim)))
    assert(out(1L)._1 == 2)
  }

  test("loop only at the tail still fires; clean prose stays clean") {
    val cleanHead = (1 to 40).map(i => s"unique$i").mkString(" ")
    val loopTail = "the cat sat " * 12 // 36 words — fills the 30-tail
    val out = detect(Seq(
      (1L, s"$cleanHead $loopTail"),
      (2L, cleanHead),
      (3L, s"$loopTail $cleanHead"))) // loop BEFORE clean tail: clean
    assert(out(1L)._1 == 3 && out(1L)._2)
    assert(out(2L)._1 == 0 && !out(2L)._2)
    assert(out(3L)._1 == 0)
  }

  test("two-full-cycles floor: a once-repeated phrase is not a loop") {
    // 8-word doc, candidate p=5 has only 1.6 cycles → not degenerate;
    // but "a b a b" (p=2, two full cycles) is
    val out = detect(Seq(
      (1L, "one two three four five one two three"),
      (2L, "a b a b"),
      (3L, "x y")))
    assert(out(1L)._1 == 0)
    assert(out(2L)._1 == 2)
    assert(out(3L)._1 == 0) // p=1 needs 2 cycles of equal tokens; x!=y
  }

  test("single-token docs are excluded; equal-pair fires p=1") {
    val out = detect(Seq((1L, "solo"), (2L, "same same")))
    assert(!out.contains(1L))
    assert(out(2L)._1 == 1)
  }
}
