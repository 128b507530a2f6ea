package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class HitsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("star graph: the shared authority and the broad hub dominate") {
    // hubs 1,2,3 -> authority 10; hub 1 also -> 11, 12 (broadest hub)
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (1L, 12L))
      .toDF("src", "dst")
    val out = Hits.run(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val scale = 1000000000L
    // node 10 is the max authority, node 1 the max hub (L-inf normalized)
    assert(out(10L)._2 == scale)
    assert(out(1L)._1 == scale)
    assert(out(11L)._2 == out(12L)._2 && out(11L)._2 < scale)
    assert(out(2L)._1 == out(3L)._1 && out(2L)._1 < scale)
    // roles: pure hubs carry auth 0, pure authorities hub 0
    assert(out(1L)._2 == 0L && out(10L)._1 == 0L)
  }

  test("brute-force replay of the exact integer fixpoint") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 11L), (3L, 10L), (3L, 12L))
    val scale = 1000000000L
    var h = Map(1L -> scale, 2L -> scale, 3L -> scale)
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 4) {
      val araw = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => h(e._1)).sum }
      val amax = araw.values.max
      a = araw.map { case (p, v) =>
        p -> (BigInt(v) * scale / amax).toLong }
      val hraw = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => a(e._2)).sum }
      val hmax = hraw.values.max
      h = hraw.map { case (s, v) =>
        s -> (BigInt(v) * scale / hmax).toLong }
    }
    val out = Hits.run(edges.toDF("src", "dst"), "src", "dst",
        iterations = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    h.foreach { case (n, v) => assert(out(n)._1 == v, s"hub $n") }
    a.foreach { case (n, v) => assert(out(n)._2 == v, s"auth $n") }
  }

  test("partitioning-invariant and leak-free") {
    val edges = (1L to 300L).map(i => (i % 17, 100L + i % 23)).toDF("src", "dst")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    def run(d: org.apache.spark.sql.DataFrame) = {
      val r = Hits.run(d, "src", "dst", iterations = 3)
        .collect().map(_.toString).sorted.toSeq
      r
    }
    assert(run(edges.coalesce(1)) == run(edges.repartition(13)))
    // iteration pins released; only the returned results' own
    // checkpoints may remain until GC — sweep and compare
    sc.getPersistentRDDs.keySet.diff(before)
      .foreach(id => sc.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = false)))
  }

  test("degenerate inputs refuse loudly") {
    intercept[IllegalArgumentException] {
      Hits.run(spark.emptyDataFrame.withColumn("src", lit(1L))
        .withColumn("dst", lit(2L)).limit(0), "src", "dst", 3).collect()
    }
  }
}
