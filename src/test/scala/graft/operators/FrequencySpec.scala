package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t
import graft.functions.TextFunctions.words

class FrequencySpec extends AnyFunSuite with SparkSuite {

  private lazy val tokens = t(spark, sf, "documents")
    .select(explode(words(col("text"))).as("w"))
    .filter(col("w") =!= "")
    .cache()

  private def exactTop(k: Int): Seq[(String, Long)] =
    tokens.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("heavy hitters equal the full groupBy top-k") {
    val got = Frequency.heavyHitters(tokens, "w", k = 20, support = 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exactTop(20))
  }

  test("partition-layout invariant (sketch merge order does not leak)") {
    val got = Frequency.heavyHitters(tokens.repartition(17), "w", 10, 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exactTop(10))
  }

  test("a broken support promise falls back to the exact path, never lies") {
    // support 0.2: nothing clears 20% share, the candidate set cannot
    // cover the true top-10 — the operator must detect it and still
    // return the exact answer via the fallback
    val got = Frequency.heavyHitters(tokens, "w", 10, support = 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exactTop(10))
  }

  test("counts are exact, not estimates") {
    val hh = Frequency.heavyHitters(tokens, "w", 5, 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    hh.foreach { case (w, c) =>
      assert(tokens.filter(col("w") === w).count() == c, s"word $w")
    }
  }
}
