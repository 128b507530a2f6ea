package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class LabelNoiseSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  // two tight clusters in 2-d; ids 1-4 near (1,0), ids 5-8 near (0,1)
  private def clustered(flip: Set[Long]) = (1L to 8L).map { i =>
    val base = if (i <= 4) Array(1f, 0.01f * i) else Array(0.01f * i, 1f)
    val label = if (flip.contains(i)) (if (i <= 4) 1 else 0) else (if (i <= 4) 0 else 1)
    (i, base, label)
  }.toDF("id", "vec", "label")

  test("clean clusters agree fully; a planted flip is the sole suspect") {
    val m = LabelNoise.knnLabelAgreement(clustered(Set(3L)), "id", "vec", "label", k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // the flipped row disagrees with ALL its neighbors
    assert(m(3L) == 0.0)
    // its cluster-mates each see the flipped row in their k=3 neighborhood
    assert(m(1L) == 2.0 / 3 && m(2L) == 2.0 / 3 && m(4L) == 2.0 / 3)
    // the other cluster is untouched
    assert(Seq(5L, 6L, 7L, 8L).forall(m(_) == 1.0))
  }

  test("self is excluded before the heap: duplicates of a row still count") {
    // rows 1 and 2 are identical vectors with the same label
    val df = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0),
      (3L, Array(0f, 1f), 1), (4L, Array(0f, 1f), 1))
      .toDF("id", "vec", "label")
    val m = LabelNoise.knnLabelAgreement(df, "id", "vec", "label", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // each row's nearest non-self neighbor is its duplicate/twin, same label
    assert(m(1L) == ((1L, 1.0)) && m(2L) == ((1L, 1.0)))
    assert(m(3L) == ((1L, 1.0)) && m(4L) == ((1L, 1.0)))
  }

  test("agreementFromHits: ANN hit stream plugs into the same roll-up") {
    val labels = Seq((1L, 0), (2L, 0), (3L, 1)).toDF("id", "label")
    val hits = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("pid", "hid")
    val m = LabelNoise.agreementFromHits(hits, "pid", "hid", labels, "id", "label", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(m(1L) == ((1L, 0.5)))  // neighbors 2 (same) and 3 (diff)
    assert(m(2L) == ((1L, 1.0)))  // one hit, same label, own denominator
    assert(m(3L) == ((0L, 0.0)))
  }

  test("matches brute-force agreement on real embeddings, any partitioning") {
    val e = graft.Tables.t(spark, sf, "embeddings").limit(120).repartition(7)
    val rows = e.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    val expect = rows.map { case (id, v, lbl) =>
      val nn = rows.filter(_._1 != id)
        .map(o => (cos(v, o._2), o._1, o._3))
        .sortBy { case (s, oid, _) => (-s, oid) }.take(5)
      id -> nn.count(_._3 == lbl).toLong
    }.toMap
    val got = LabelNoise.knnLabelAgreement(e, "vec_id", "embedding", "label", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
  }
}
