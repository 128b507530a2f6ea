package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class IrMetricsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("recall@k, MRR and AP match hand-computed values") {
    // probe 1: rel docs {10, 20, 30}; results rank 1=99, 2=20, 3=10
    //   -> hits 2, recall 2/3, mrr 1/2, ap (1/2 + 2/3)/3 = 0.388889
    // probe 2: rel docs {40}; results never hit -> all zero
    // probe 3: rel docs {50, 60}; first result relevant -> mrr 1, ap 1/2
    val results = Seq(
      (1L, 99L, 1), (1L, 20L, 2), (1L, 10L, 3),
      (2L, 99L, 1), (2L, 98L, 2),
      (3L, 50L, 1), (3L, 97L, 2)).toDF("probe_id", "doc_id", "rn")
    val qrels = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 40L),
      (3L, 50L), (3L, 60L)).toDF("probe_id", "doc_id")
    val out = IrMetrics.evaluate(results, qrels, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(1L) == ((3L, 2L, 0.666667, 0.5, 0.388889)))
    assert(out(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    assert(out(3L) == ((2L, 1L, 0.5, 1.0, 0.5)))
  }

  test("ranks beyond k are ignored; probes missing from results score zero") {
    val results = Seq((1L, 10L, 11)).toDF("probe_id", "doc_id", "rn") // rank > k
    val qrels = Seq((1L, 10L), (2L, 20L)).toDF("probe_id", "doc_id")
    val out = IrMetrics.evaluate(results, qrels, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(1L) == ((0L, 0.0, 0.0, 0.0)))
    assert(out(2L) == ((0L, 0.0, 0.0, 0.0))) // probe absent from results, still reported
  }

  test("perfect retrieval scores recall 1, mrr 1 and ap 1") {
    val results = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("probe_id", "doc_id", "rn")
    val qrels = Seq((1L, 10L), (1L, 11L)).toDF("probe_id", "doc_id")
    val r = IrMetrics.evaluate(results, qrels, k = 10).head()
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
  }

  test("ndcg matches a hand computation within epsilon") {
    // probe 1: rel {10, 20}; hits at ranks 2 and 3
    // DCG  = 1/log2(3) + 1/log2(4); IDCG = 1/log2(2) + 1/log2(3)
    val results = Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 20L, 3))
      .toDF("probe_id", "doc_id", "rn")
    val qrels = Seq((1L, 10L), (1L, 20L)).toDF("probe_id", "doc_id")
    val got = IrMetrics.ndcg(results, qrels, k = 10).head().getDouble(2)
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val want = (1.0 / log2(3) + 1.0 / log2(4)) / (1.0 / log2(2) + 1.0 / log2(3))
    assert(math.abs(got - want) < 1e-9, s"$got vs $want")
    // perfect ranking scores 1 exactly (DCG == IDCG termwise)
    val perfect = IrMetrics.ndcg(
      Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("probe_id", "doc_id", "rn"),
      qrels, k = 10).head().getDouble(2)
    assert(math.abs(perfect - 1.0) < 1e-12)
  }

  test("rankLcm: every rank divides it; overflow guarded") {
    assert(IrMetrics.rankLcm(10) == 2520L)
    (1 to 40).foreach(k => (1 to k).foreach(i =>
      assert(IrMetrics.rankLcm(k) % i == 0)))
    intercept[IllegalArgumentException] {
      IrMetrics.evaluate(null, null, 41)
    }
  }

  test("rbo: hand-computed truncated overlap at p = 0.5") {
    // A = [a,b,c], B = [a,c,d]; overlaps 1,1,2 at depths 1,2,3
    // rbo = .5*(1*1/1 + .5*1/2 + .25*2/3)
    val a = Seq(("a", 30L), ("b", 20L), ("c", 10L)).toDF("item", "w")
    val b = Seq(("a", 30L), ("c", 20L), ("d", 10L)).toDF("item", "w")
    val out = IrMetrics.rbo(a, b, "item", "w", k = 3, p = 0.5).collect()
    assert(out.map(_.getAs[Long]("overlap")).toSeq == Seq(1L, 1L, 2L))
    val exp = BigDecimal(0.5 * (1.0 * 1.0 / 1.0 + 0.5 * 1.0 / 2.0 +
      0.25 * 2.0 / 3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(out.forall(_.getAs[Double]("rbo_at_k") == exp))
  }

  test("rbo: identical rankings agree everywhere; disjoint score 0") {
    val a = (1 to 50).map(i => (s"t$i", (100 - i).toLong)).toDF("item", "w")
    val same = IrMetrics.rbo(a, a, "item", "w", k = 50).collect()
    assert(same.forall(_.getAs[Double]("agreement") == 1.0))
    assert(same.head.getAs[Double]("rbo_at_k") > 0.99)
    val b = (1 to 50).map(i => (s"u$i", (100 - i).toLong)).toDF("item", "w")
    val disj = IrMetrics.rbo(a, b, "item", "w", k = 50).collect()
    assert(disj.forall(_.getAs[Long]("overlap") == 0L))
    assert(disj.head.getAs[Double]("rbo_at_k") == 0.0)
  }

  test("rbo: top-heavy — a tail swap moves the score far less than a " +
    "head swap; partitioning-invariant") {
    val base = (1 to 20).map(i => (s"t$i", (100 - i).toLong))
    val a = base.toDF("item", "w")
    // swap ranks 1 and 2 vs swap ranks 19 and 20
    def swapped(i: Int, j: Int) = {
      val arr = base.toArray
      val tmp = arr(i)._1; arr(i) = (arr(j)._1, arr(i)._2)
      arr(j) = (tmp, arr(j)._2)
      arr.toSeq.toDF("item", "w")
    }
    def score(other: org.apache.spark.sql.DataFrame) =
      IrMetrics.rbo(a, other, "item", "w", k = 20).head()
        .getAs[Double]("rbo_at_k")
    val headSwap = score(swapped(0, 1))
    val tailSwap = score(swapped(18, 19))
    assert(headSwap < tailSwap && tailSwap < 1.0)
    val p1 = IrMetrics.rbo(a.repartition(7), a.coalesce(1), "item", "w",
      k = 20).collect().map(_.toString).toSeq
    val p2 = IrMetrics.rbo(a, a, "item", "w", k = 20)
      .collect().map(_.toString).toSeq
    assert(p1 == p2)
  }
}
