package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the minimax PAV: equality with the sequential
  * pool-adjacent-violators reference on hand data AND on the real
  * corpus, monotonicity, and pooling across empty bins. */
class IsotonicSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Sequential PAV reference (the textbook merge loop) over
    * (bin, n, pos) rows sorted by bin — exact rational pooling. */
  private def pavRef(binned: Seq[(Int, Long, Long)]): Seq[(Int, Double)] = {
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    binned.sortBy(_._1).foreach { case (_, n, p) =>
      blocks += ((p, n, 1))
      while (blocks.length > 1 && {
        val a = blocks(blocks.length - 2); val b = blocks.last
        a._1 * b._2 >= b._1 * a._2 // exact rational >= compare
      }) {
        val b = blocks.remove(blocks.length - 1)
        val a = blocks.remove(blocks.length - 1)
        blocks += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
    }
    val sorted = binned.sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var i = 0
    blocks.foreach { case (p, n, cover) =>
      (0 until cover).foreach { _ =>
        out += ((sorted(i)._1, p.toDouble / n.toDouble)); i += 1
      }
    }
    out.toSeq
  }

  test("matches sequential PAV on a hand case with a violation chain") {
    // rates: .8, .2, .4, .9 -> PAV pools bins 0-2 to (4+1+2)/(5+5+5)
    val rows = Seq.tabulate(5)(i => (0.01, i < 4)) ++
      Seq.tabulate(5)(i => (0.21, i < 1)) ++
      Seq.tabulate(5)(i => (0.41, i < 2)) ++
      Seq.tabulate(10)(i => (0.61, i < 9))
    val got = Isotonic.pavBinned(rows.toDF("score", "y"), "score", "y", bins = 5)
      .collect().map(r => (r.getInt(0), r.getDouble(4)))
    val want = pavRef(Seq((0, 5L, 4L), (1, 5L, 1L), (2, 5L, 2L), (3, 10L, 9L)))
    assert(got.toSeq == want)
    assert(got.head._2 == 7.0 / 15.0)
  }

  test("matches sequential PAV on the real scored corpus (with gaps)") {
    val e = graft.Tables.t(spark, sf, "embeddings")
    val probe = e.filter($"vec_id" === 0).head()
    val pv = probe.getSeq[Float](1).toArray
    val scored = e.select(
      ((graft.functions.VectorFunctions.cosine_sim($"embedding", typedlit(pv))
        + 1.0) / 2.0).as("score"),
      ($"label" === probe.getInt(2)).as("y"))
    val got = Isotonic.pavBinned(scored, "score", "y", bins = 20)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    val ref = pavRef(got.map(r => (r._1, r._2, r._3)).toSeq)
    assert(got.map(r => (r._1, r._4)).toSeq == ref)
    // monotone non-decreasing across OBSERVED bins (gaps pooled over)
    got.map(_._4).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b + 1e-15); case _ =>
    }
  }

  test("rejects NULL-polluted input only via exclusion, and bad bins loudly") {
    val df = Seq((Some(0.5), Some(true)), (None, Some(true)),
      (Some(0.7), None)).toDF("score", "y")
    val out = Isotonic.pavBinned(df, "score", "y", bins = 10).collect()
    assert(out.map(_.getLong(1)).sum == 1L) // only the complete row counts
    intercept[IllegalArgumentException] {
      Isotonic.pavBinned(df, "score", "y", bins = 1)
    }
  }
}
