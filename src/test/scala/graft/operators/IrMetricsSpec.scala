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
}
