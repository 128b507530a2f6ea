package graft.embed

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class EmbedderSpec extends AnyFunSuite with SparkSuite {

  private val emb = HashProjectionEmbedder(dims = 64)

  test("deterministic: same text, same vector; different seed differs") {
    val a = emb.embedOne("the quick brown fox")
    val b = emb.embedOne("the quick brown fox")
    assert(a.sameElements(b))
    val c = HashProjectionEmbedder(dims = 64, seed = 7L).embedOne("the quick brown fox")
    assert(!a.sameElements(c))
  }

  test("unit norm, correct dims, null/empty-safe") {
    val v = emb.embedOne("hello world foo")
    assert(v.length == 64)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    assert(emb.embedOne("").forall(_ == 0.0f))
    assert(emb.embedOne(null).forall(_ == 0.0f))
  }

  test("similar texts are closer than dissimilar ones") {
    def cos(a: Array[Float], b: Array[Float]) =
      a.lazyZip(b).map((x, y) => x.toDouble * y).sum
    val bike1 = emb.embedOne("mountain bike with carbon frame")
    val bike2 = emb.embedOne("mountain bike with alloy frame")
    val sock = emb.embedOne("cosmic racing socks red medium")
    assert(cos(bike1, bike2) > cos(bike1, sock))
  }

  test("withEmbedding: batched mapPartitions stage over documents (V4)") {
    val docs = t(spark, sf, "documents").limit(100)
    val out = Embed.withEmbedding(docs, "text", "vector", emb, batchSize = 32)
    assert(out.schema("vector").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false))
    val rows = out.select(col("doc_id"), col("text"), col("vector")).collect()
    assert(rows.length == 100)
    // spot-check parity with direct embedding
    rows.take(5).foreach { r =>
      assert(r.getSeq[Float](2).toArray.sameElements(emb.embedOne(r.getString(1))))
    }
  }
}
