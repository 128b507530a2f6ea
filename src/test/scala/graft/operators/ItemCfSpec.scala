package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for basket cosine: a hand-walked 3-basket case,
  * the min-support prune, duplicate-line collapsing, and the
  * deterministic tie order. */
class ItemCfSpec extends AnyFunSuite with SparkSuite {

  test("hand-walked: cos = n_both / sqrt(n_a * n_b) on 3 baskets") {
    import spark.implicits._
    // baskets: {1,2}, {1,2}, {1,3} → n1=3, n2=2, n3=1
    // (1,2): 2/sqrt(6); (1,3): 1/sqrt(3); (2,3): absent (never co-occur)
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L)).toDF("b", "i")
    val out = ItemCf.itemCosine(rows.repartition(3), "b", "i", topK = 10)
      .collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("item_a") == 1L &&
      out(0).getAs[Long]("item_b") == 2L)
    assert(math.abs(out(0).getAs[Double]("cosine") -
      2.0 / math.sqrt(6.0)) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("cosine") -
      1.0 / math.sqrt(3.0)) < 1e-6)
  }

  test("min-support prunes rare items BEFORE the pair join; dup lines collapse") {
    import spark.implicits._
    // item 3 appears once → pruned at minSupport=2; duplicate (10,1)
    // lines must count once
    val rows = Seq((10L, 1L), (10L, 1L), (10L, 2L), (11L, 1L),
      (11L, 2L), (12L, 3L)).toDF("b", "i")
    val out = ItemCf.itemCosine(rows, "b", "i", topK = 10,
      minSupport = 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) == ((1L, 2L)))
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_both") == 2L)
  }

  test("topK truncates on (cosine desc, item_a, item_b)") {
    import spark.implicits._
    // four equal-cosine pairs: the kept two must be the lowest ids
    val rows = (0L until 4L).flatMap(p =>
      Seq((100L + p, 2 * p), (100L + p, 2 * p + 1))).toDF("b", "i")
    val out = ItemCf.itemCosine(rows, "b", "i", topK = 2).collect()
    assert(out.map(r => (r.getAs[Long]("item_a"),
      r.getAs[Long]("item_b"))).toSeq == Seq((0L, 1L), (2L, 3L)))
  }
}
