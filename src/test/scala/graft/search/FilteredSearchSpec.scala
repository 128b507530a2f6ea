package graft.search

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t
import graft.store.DocumentStore

/** Filtered (metadata predicate + top-k) search across every
  * [[VectorSearcher]] strategy: results must all satisfy the predicate,
  * and each index-backed strategy must agree with the filtered exact
  * scan at recall >= 0.9 — the same bar the unfiltered seam holds. */
class FilteredSearchSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val emb = t(spark, sf, "embeddings").cache()
  private lazy val probe = emb.filter($"vec_id" === 0L).head().getSeq[Float](1).toArray
  private val pred = col("label") === 2

  private lazy val searchers: Seq[(String, VectorSearcher)] = {
    val ivfIdx = IvfIndex.train(emb, "embedding", "vec_id", numLists = 8, iters = 2,
      multiAssign = 2)
    val store = new DocumentStore(spark,
      Files.createTempDirectory("graft-filtered").toString)
    val ivf = new IvfStore(store, "vecs", ivfIdx, "embedding", "vec_id")
    ivf.build(emb)
    val graphs = HnswIndex.build(emb, "embedding", "vec_id").cache()
    val cb = PqIndex.train(emb, "embedding", "vec_id", m = 16, ks = 16)
    val encoded = PqIndex.encode(cb, emb, "embedding")
      .select($"vec_id", $"pq_codes", $"norm").cache()
    val ivfpq = new IvfPq(ivfIdx, cb,
      new DocumentStore(spark, Files.createTempDirectory("graft-filtered-pq").toString),
      "ivfpq", "embedding", "vec_id")
    ivfpq.build(emb)
    Seq(
      "ivf" -> new IvfSearcher(ivf, nprobe = 6),
      "hnsw" -> new HnswSearcher(graphs),
      "quantized" -> QuantizedSearcher,
      "pq" -> new PqSearcher(cb, encoded),
      "ivfpq" -> new IvfPqSearcher(ivfpq, nprobe = 6))
  }

  test("filtered exact == brute force over the predicate's survivors") {
    val got = ExactSearcher.topKWhere(emb, "embedding", "vec_id", probe, 10, pred)
      .select($"vec_id").as[Long].collect().toSeq
    val want = VectorSearch.exactTopK(emb.filter(pred), "embedding", "vec_id", probe, 10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == want && got.size == 10)
  }

  test("every strategy: all hits satisfy the predicate; recall >= 0.9 vs filtered exact") {
    val exact = ExactSearcher.topKWhere(emb, "embedding", "vec_id", probe, 10, pred)
      .select($"vec_id").as[Long].collect().toSet
    val allowed = emb.filter(pred).select($"vec_id").as[Long].collect().toSet
    for ((kind, s) <- searchers) {
      val hits = s.topKWhere(emb, "embedding", "vec_id", probe, 10, pred)
        .select($"vec_id").as[Long].collect().toSeq
      assert(hits.nonEmpty && hits.forall(allowed), s"$kind returned excluded rows")
      val recall = (hits.toSet intersect exact).size / 10.0
      assert(recall >= 0.9, s"$kind filtered recall $recall")
    }
  }
}
