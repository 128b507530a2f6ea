package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class BoilerplateSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private val banner = (1 to 10).map(_ => "nav").mkString(" ")

  test("a planted banner segment is removed from every doc; organic text survives") {
    val docs = (1L to 6L).map(i =>
      (i, banner + " " + (1 to 10).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("id", "text")
    val out = Boilerplate.removeRepeatedSegments(docs, "id", "text",
        segWords = 10, minDf = 5L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    (1L to 6L).foreach { i =>
      val (clean, nSeg, nDropped) = out(i)
      assert(nSeg == 2L && nDropped == 1L)
      assert(clean == (1 to 10).map(j => s"w${i}_$j").mkString(" "))
    }
  }

  test("below-threshold repeats are kept") {
    val docs = (1L to 4L).map(i => (i, banner)).toDF("id", "text") // df=4 < 5
    val out = Boilerplate.removeRepeatedSegments(docs, "id", "text", 10, 5L)
      .collect()
    assert(out.forall(r => r.getLong(3) == 0L && r.getString(1) == banner))
  }

  test("a doc whose every segment is boilerplate empties but stays present") {
    val docs = ((1L to 5L).map(i => (i, banner + " tail" + i)) :+ (6L, banner))
      .toDF("id", "text")
    val out = Boilerplate.removeRepeatedSegments(docs, "id", "text", 10, 5L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(6L) == (("", 1L, 1L)))
    assert(out(1L)._1 == "tail1")
  }

  test("empty doc: zero segments, present with n_seg 0") {
    val docs = Seq((1L, ""), (2L, banner + " x"), (3L, banner + " y"),
      (4L, banner + " z"), (5L, banner + " w"), (6L, banner + " v"))
      .toDF("id", "text")
    val out = Boilerplate.removeRepeatedSegments(docs, "id", "text", 10, 5L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("", 0L)))
  }

  test("accounting: n_seg - n_dropped equals kept segments; repeatedSegments agrees") {
    val docs = (1L to 8L).map(i => (i, banner + " " + s"unique$i a b c")).toDF("id", "text")
    val out = Boilerplate.removeRepeatedSegments(docs, "id", "text", 10, 5L)
    val hot = Boilerplate.repeatedSegments(docs, "id", "text", 10, 5L).collect()
    assert(hot.length == 1 && hot(0).getString(0) == banner && hot(0).getLong(1) == 8L)
    assert(out.agg(sum(col("n_dropped"))).head().getLong(0) == 8L)
  }

  test("output invariant to input partitioning") {
    val docs = (1L to 30L).map(i =>
      (i, banner + " " + (1 to 7).map(j => s"t${i % 5}_$j").mkString(" ")))
      .toDF("id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Boilerplate.removeRepeatedSegments(df, "id", "text", 10, 5L)
        .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(docs) == run(docs.repartition(11)))
  }
}
