package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** [[Dedup.removeDuplicatedSpans]] — the span-excision contract:
  * duplicated k-token windows (≥2 distinct docs) cover token intervals,
  * overlapping/touching covers merge into maximal runs, the runs are cut
  * out, and the accounting is exact. Brute-force string-span oracle per
  * test (the q422 gate re-proves the hash equivalence at corpus scale).
  */
class DedupSpanRemovalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val K = 3

  /** Brute force with string spans: duplicated window offsets → covered
    * token set → maximal runs → cut. */
  private def expect(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val spanDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, w) <- toks; i <- 0 to w.length - K)
      spanDocs.updateWith(w.slice(i, i + K).mkString(" "))(
        s => Some(s.getOrElse(Set.empty) + id))
    val hot = spanDocs.filter(_._2.size >= 2).keySet
    docs.map { case (id, _) =>
      val w = toks(id)
      val dupOffs = (0 to w.length - K).filter(i => hot(w.slice(i, i + K).mkString(" ")))
      val covered = dupOffs.flatMap(i => i until i + K).toSet
      // runs = maximal contiguous covered regions
      val runs = covered.toSeq.sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((lo, hi) :: rest, t) if t == hi + 1 => (lo, t) :: rest
        case (acc, t) => (t, t) :: acc
      }
      val kept = w.zipWithIndex.collect { case (tk, i) if !covered(i) => tk }
      id -> ((w.length.toLong, covered.size.toLong, runs.size.toLong,
        kept.mkString(" ")))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] =
    Dedup.removeDuplicatedSpans(docs.toDF("id", "text"), "id", "text", k = K)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap

  private def check(docs: Seq[(Long, String)]): Unit = {
    val got = run(docs)
    val want = expect(docs)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("a shared span is cut from both docs; unique text survives") {
    val docs = Seq(
      (1L, "alpha beta gamma COMMON1 COMMON2 COMMON3 delta epsilon zeta"),
      (2L, "one two COMMON1 COMMON2 COMMON3 three four five six seven"))
    check(docs)
    val got = run(docs)
    assert(got(1L)._2 == 3L && got(1L)._3 == 1L) // exactly the shared window
    assert(got(1L)._4 == "alpha beta gamma delta epsilon zeta")
    assert(got(2L)._4 == "one two three four five six seven")
  }

  test("overlapping duplicated windows merge into ONE run") {
    // docs share a 5-token phrase → three overlapping 3-windows in each;
    // covers [i, i+4] merge into a single run of 5 tokens
    val docs = Seq(
      (1L, "u1 u2 C1 C2 C3 C4 C5 u3 u4"),
      (2L, "v1 C1 C2 C3 C4 C5 v2 v3 v4"))
    check(docs)
    val got = run(docs)
    assert(got(1L)._2 == 5L && got(1L)._3 == 1L, "one merged run of 5")
  }

  test("whole-doc removal: identical docs come back empty") {
    val text = "a b c d e f g h"
    val docs = Seq((1L, text), (2L, text), (3L, "unrelated words only here"))
    val got = run(docs)
    check(docs)
    assert(got(1L) == ((8L, 8L, 1L, "")))
    assert(got(2L) == ((8L, 8L, 1L, "")))
    assert(got(3L)._2 == 0L && got(3L)._4 == "unrelated words only here")
  }

  test("boundary runs: cuts at position 0 and at the tail") {
    val docs = Seq(
      (1L, "C1 C2 C3 mid1 mid2 mid3 mid4 D1 D2 D3"),
      (2L, "C1 C2 C3 other stuff D1 D2 D3"))
    check(docs)
    val got = run(docs)
    assert(got(1L)._3 == 2L, "head run + tail run")
    assert(got(1L)._4 == "mid1 mid2 mid3 mid4")
  }

  test("separated duplicated spans stay separate runs; the gap is kept") {
    val docs = Seq(
      (1L, "A1 A2 A3 k1 k2 k3 k4 k5 B1 B2 B3"),
      (2L, "A1 A2 A3 z1 z2 z3 z4 z5 B1 B2 B3"))
    // wait — the shared prefix/suffix make windows straddling the gap
    // differ (k1.. vs z1..), so each doc has exactly two duplicated
    // windows at offsets 0 and 8
    check(docs)
    val got = run(docs)
    assert(got(1L)._3 == 2L)
    assert(got(1L)._4 == "k1 k2 k3 k4 k5")
  }

  test("docs shorter than k and within-doc-only repeats are untouched") {
    val docs = Seq(
      (1L, "x y"),                                   // < k tokens: no windows
      (2L, "r1 r2 r3 pad r1 r2 r3 tail1 tail2"),     // self-repeat only: 1 doc
      (3L, "totally different text here now"))
    val got = run(docs)
    check(docs)
    assert(got(1L) == ((2L, 0L, 0L, "x y")))
    assert(got(2L)._2 == 0L, "within-doc repeat alone must not qualify")
  }

  test("empty and whitespace-heavy text normalizes cleanly") {
    val docs = Seq((1L, ""), (2L, "  a   b  "), (3L, "c d e f"))
    val got = run(docs)
    assert(got(1L) == ((0L, 0L, 0L, "")))
    assert(got(2L) == ((2L, 0L, 0L, "a b")))
  }

  private def runKeepFirst(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] =
    Dedup.removeDuplicatedSpans(docs.toDF("id", "text"), "id", "text",
        k = K, keepFirst = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap

  /** keepFirst brute force: the span's min (doc, off) occurrence is
    * exempt; everything else duplicated is covered. */
  private def expectKeepFirst(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val occ = scala.collection.mutable.Map.empty[String, Vector[(Long, Int)]]
    for ((id, w) <- docs.map(d => d._1 -> toks(d._1)); i <- 0 to w.length - K)
      occ.updateWith(w.slice(i, i + K).mkString(" "))(
        v => Some(v.getOrElse(Vector.empty) :+ ((id, i))))
    val hot = occ.filter(_._2.map(_._1).toSet.size >= 2)
    val keeper = hot.map { case (s, os) => s -> os.min }
    docs.map { case (id, _) =>
      val w = toks(id)
      val removable = (0 to w.length - K).filter { i =>
        val s = w.slice(i, i + K).mkString(" ")
        hot.contains(s) && keeper(s) != ((id, i))
      }
      val covered = removable.flatMap(i => i until i + K).toSet
      val runs = covered.toSeq.sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((lo, hi) :: rest, t) if t == hi + 1 => (lo, t) :: rest
        case (acc, t) => (t, t) :: acc
      }
      val kept = w.zipWithIndex.collect { case (tk, i) if !covered(i) => tk }
      id -> ((w.length.toLong, covered.size.toLong, runs.size.toLong,
        kept.mkString(" ")))
    }.toMap
  }

  test("keepFirst: the first occurrence survives, later copies are cut") {
    val docs = Seq(
      (1L, "head C1 C2 C3 tail one"),
      (2L, "other words C1 C2 C3 more here"),
      (3L, "third copy C1 C2 C3 end bits"))
    val got = runKeepFirst(docs)
    assert(got == expectKeepFirst(docs))
    assert(got(1L)._4 == "head C1 C2 C3 tail one", "doc 1 holds the keeper")
    assert(got(2L)._4 == "other words more here")
    assert(got(3L)._4 == "third copy end bits")
  }

  test("keepFirst: identical docs keep exactly one full copy") {
    val text = "a b c d e f g h"
    val docs = Seq((5L, text), (9L, text), (7L, text))
    val got = runKeepFirst(docs)
    assert(got == expectKeepFirst(docs))
    assert(got(5L)._4 == text, "lowest doc id keeps the text")
    assert(got(7L)._4 == "" && got(9L)._4 == "")
  }

  test("keepFirst: a keeper can still be cut by ANOTHER span's run (documented)") {
    // doc 1 holds the keeper for Y1 Y2 Y3 but its copy sits INSIDE the
    // X-run doc 1 shares with doc 2 as a LATER occurrence
    val docs = Seq(
      (0L, "X1 X2 X3 X4 X5 solo0"),
      (1L, "pre X1 X2 X3 X4 X5 Y1 Y2 Y3 post"),
      (2L, "zz Y1 Y2 Y3 ww vv uu"))
    val got = runKeepFirst(docs)
    assert(got == expectKeepFirst(docs))
  }

  test("keepFirst matches brute force on a planted corpus") {
    val docs = (0L until 30L).map { i =>
      val shared = if (i % 3 == 0) "S1 S2 S3 S4 " else ""
      (i, shared + (0 until 8).map(j => s"w${i}_$j").mkString(" "))
    }
    assert(runKeepFirst(docs) == expectKeepFirst(docs))
  }

  test("matches brute force on a generated corpus with planted duplication") {
    // planted: every 4th doc shares a 6-token block; plus randomized tails
    val docs = (0L until 40L).map { i =>
      val shared = if (i % 4 == 0) "S1 S2 S3 S4 S5 S6 " else ""
      val tail = (0 until 10).map(j => s"w${i}_$j").mkString(" ")
      (i, shared + tail)
    }
    check(docs)
  }
}
