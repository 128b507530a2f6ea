package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Sliding word-window chunking: window/stride arithmetic, full
  * coverage (every word appears in some chunk), overlap width, and the
  * short/empty-document floor of one chunk. */
class ChunkerSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def chunks(text: String, size: Int, stride: Int): Seq[(Long, String, Long)] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    Chunker.slidingWordChunks(df, "doc_id", "text", size, stride)
      .select("chunk_id", "chunk_text", "n_words")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
  }

  test("11 words, size 4 stride 3: four chunks, last ragged") {
    val text = (1 to 11).map(i => s"w$i").mkString(" ")
    val got = chunks(text, 4, 3)
    assert(got == Seq(
      (0L, "w1 w2 w3 w4", 4L), (1L, "w4 w5 w6 w7", 4L),
      (2L, "w7 w8 w9 w10", 4L), (3L, "w10 w11", 2L)))
  }

  test("every word is covered; consecutive chunks overlap by size-stride") {
    val words = (1 to 50).map(i => s"t$i")
    val got = chunks(words.mkString(" "), 10, 7)
    assert(got.flatMap(_._2.split(" ")).toSet == words.toSet)
    got.sliding(2).foreach {
      case Seq((_, a, _), (_, b, _)) =>
        assert(a.split(" ").takeRight(3).toSeq == b.split(" ").take(3).toSeq)
      case _ =>
    }
  }

  test("doc shorter than one window: exactly one chunk with all words") {
    assert(chunks("a b c", 10, 5) == Seq((0L, "a b c", 3L)))
  }

  test("empty doc still yields one (empty) chunk — ingest keeps the row") {
    assert(chunks("", 10, 5) == Seq((0L, "", 0L)))
  }

  test("null text behaves exactly like empty text") {
    assert(chunks(null, 10, 5) == Seq((0L, "", 0L)))
  }

  test("stride == size: disjoint partition of the words") {
    val got = chunks((1 to 9).map("x" + _).mkString(" "), 3, 3)
    assert(got.map(_._3).sum == 9L && got.size == 3)
  }
}
