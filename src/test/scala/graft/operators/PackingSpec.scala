package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Concat-then-chunk packing: the distributed two-phase offset pass must
  * reproduce the sequential layout exactly — same slices, same order,
  * under any partition count — and preserve every token exactly once. */
class PackingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Driver-side sequential reference layout. */
  private def reference(docs: Seq[(Long, Long)], seqLen: Long): Seq[(Long, Long, Long, Long)] = {
    var off = 0L
    docs.sortBy(_._1).filter(_._2 > 0).flatMap { case (id, n) =>
      val start = off; off += n
      (start / seqLen to (start + n - 1) / seqLen).map { s =>
        (s, id, math.max(start - s * seqLen, 0L),
          math.min(start + n, (s + 1) * seqLen) - math.max(start, s * seqLen))
      }
    }
  }

  private def run(docs: Seq[(Long, Long)], seqLen: Long, parts: Int): Seq[(Long, Long, Long, Long)] = {
    val df = docs.toDF("id", "n").repartition(5)
    Packing.concatChunkBy(df, "id", org.apache.spark.sql.functions.col("n"), seqLen, parts)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
  }

  private val corpus: Seq[(Long, Long)] =
    Seq(1L -> 3L, 2L -> 10L, 3L -> 0L, 4L -> 25L, 5L -> 1L, 6L -> 7L, 7L -> 2L)

  test("matches the sequential layout; a 25-token doc spans sequences") {
    val got = run(corpus, seqLen = 8L, parts = 3)
    assert(got == reference(corpus, 8L).sorted)
    // doc 4 (25 tokens at offset 13) must span seqs 1..4
    assert(got.filter(_._2 == 4L).map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("identical layout under 1, 3, and 8 offset partitions") {
    val w1 = run(corpus, 8L, 1)
    assert(run(corpus, 8L, 3) == w1 && run(corpus, 8L, 8) == w1)
  }

  test("token conservation: every non-empty doc's tokens land exactly once") {
    val got = run(corpus, 8L, 4)
    val perDoc = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(perDoc == corpus.filter(_._2 > 0).toMap)
    // all sequences but the last are exactly full
    val perSeq = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val last = perSeq.keys.max
    assert(perSeq.filter(_._1 != last).values.forall(_ == 8L))
  }

  test("zero-token docs are dropped; empty corpus packs to nothing") {
    assert(run(Seq(1L -> 0L, 2L -> 0L), 8L, 2).isEmpty)
    assert(run(Seq.empty, 8L, 2).isEmpty)
  }

  test("word-count entry point: text docs pack by whitespace token count") {
    val df = Seq((1L, "a b c"), (2L, "d e f g h")).toDF("doc_id", "text")
    val got = Packing.concatChunk(df, "doc_id", "text", seqLen = 4L)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    // stream: doc1 [0,3) doc2 [3,8) -> seq0: doc1@0×3 + doc2@3×1; seq1: doc2@0×4
    assert(got == Seq((0L, 1L, 0L, 3L), (0L, 2L, 3L, 1L), (1L, 2L, 0L, 4L)))
  }

  test("packingStats reports fill and totals") {
    val df = corpus.toDF("id", "n")
    val packed = Packing.concatChunkBy(df, "id", org.apache.spark.sql.functions.col("n"), 8L, 3)
    val r = Packing.packingStats(packed, 8L).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 48L) // 48 tokens -> 6 seqs
  }
}
