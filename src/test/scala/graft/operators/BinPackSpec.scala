package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** [[Packing.binPackDocs]] — no-split NFD packing contract: capacity
  * is never exceeded, docs never split, oversized docs come back
  * bin = -1 without disturbing the fold state, shard boundaries reset
  * the fold even when hash partitioning co-locates shards, and the
  * whole assignment equals a driver brute-force replica. */
class BinPackSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Driver replica of the shard-local NFD fold. */
  private def expect(docs: Seq[(Long, Long)], cap: Long, shards: Int)
      : Map[Long, (Long, Long)] =
    docs.filter(_._2 > 0).groupBy(_._1 % shards).flatMap { case (sh, ds) =>
      var bin = -1L; var fill = cap
      ds.sortBy { case (id, tok) => (-tok, id) }.map { case (id, tok) =>
        if (tok > cap) id -> (sh, -1L)
        else if (fill + tok <= cap) { fill += tok; id -> (sh, bin) }
        else { bin += 1; fill = tok; id -> (sh, bin) }
      }
    }

  private def run(docs: Seq[(Long, Long)], cap: Long, shards: Int) =
    Packing.binPackDocs(
        docs.toDF("doc_id", "tok"), "doc_id", col("tok"), cap, shards)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("bin"))).toMap

  test("planted sizes: NFD fills, opens, and drops exactly as computed") {
    // one shard: sizes 60,60,50,40,30 at cap 100 →
    // sorted: 60,60,50,40,30 → bins [60+?]: 60|60+?... fold:
    // 60→bin0(60), 60→bin1(60 doesn't fit 60+60>100)→wait 60+60=120>100
    // so bin1(60); 50: 60+50>100 → bin2(50); 40: 50+40=90 → bin2;
    // 30: 90+30>100 → bin3(30)
    val docs = Seq((0L, 60L), (8L, 60L), (16L, 50L), (24L, 40L), (32L, 30L))
    val out = run(docs, 100L, 8)
    assert(out(0L)._2 == 0L && out(8L)._2 == 1L)
    assert(out(16L)._2 == 2L && out(24L)._2 == 2L)
    assert(out(32L)._2 == 3L)
    assert(out == expect(docs, 100L, 8))
  }

  test("oversized docs drop with bin -1 and do not disturb the fold") {
    // the 500-token doc sorts first; packables still start at bin 0
    val docs = Seq((0L, 500L), (8L, 40L), (16L, 40L), (24L, 40L))
    val out = run(docs, 100L, 8)
    assert(out(0L)._2 == -1L)
    assert(out(8L)._2 == 0L && out(16L)._2 == 0L) // 40+40 fits
    assert(out(24L)._2 == 1L)                      // 80+40 overflows
  }

  test("co-located shards reset the fold at the boundary") {
    // shards = 2 but ONE partition: both shards' runs must not bleed
    val docs = (0L until 40L).map(i => (i, 30L + (i % 5)))
    val out = Packing.binPackDocs(
        docs.toDF("doc_id", "tok").coalesce(1), "doc_id", col("tok"),
        seqLen = 100L, shards = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("bin"))).toMap
    assert(out == expect(docs, 100L, 2))
    // both shards independently start at bin 0
    assert(out.collect { case (_, (0L, b)) => b }.min == 0L)
    assert(out.collect { case (_, (1L, b)) => b }.min == 0L)
  }

  test("corpus invariants: no bin overflows, no doc splits, layouts agree") {
    val d = graft.Tables.t(spark, sf, "documents")
    val toks = size(graft.functions.TextFunctions.words(col("text")))
    val packed = Packing.binPackDocs(d, "doc_id", toks, 128L, 8)
    val fills = packed.filter(col("bin") >= 0)
      .groupBy(col("shard"), col("bin")).agg(sum(col("n_tokens")).as("f"))
    assert(fills.filter(col("f") > 128L).count() == 0L)
    assert(packed.groupBy(col("doc_id")).count()
      .filter(col("count") > 1).count() == 0L)
    val a = packed.collect().map(_.toString).sorted.toSeq
    val b = Packing.binPackDocs(d.repartition(13), "doc_id", toks, 128L, 8)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
