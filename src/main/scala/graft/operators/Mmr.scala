package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998): re-rank a
  * retrieval shortlist so the k results are relevant AND mutually
  * diverse — the serve-side answer to near-duplicate corpora, where
  * plain top-k returns k copies of the same document (the reference's
  * `$search` top-k has exactly this failure mode on its duplicated
  * product descriptions).
  *
  * Selection is greedy: first the most query-similar candidate, then
  * repeatedly argmax of λ·sim(q,c) − (1−λ)·max_{s∈selected} sim(c,s).
  * With λ = 1/2 the doubled objective 2·score = qsim − maxsel is
  * integer-exact once similarities are integer dot products on a
  * 2^-gridBits grid (floor of an exponent shift) — so the whole
  * ranking is bit-stable across engines and partitionings, ties broken
  * by id.
  *
  * Scale shape: the corpus-touching pass is the shortlist top-C (codegen
  * integer dot + per-task k-heap `TakeOrderedAndProject`); the greedy
  * loop is O(k·C) driver arithmetic over C grid vectors — bounded by
  * the shortlist exactly like the PQ rerank, never by the corpus. C is
  * the recall/diversity lever (C ≥ k·(expected duplication factor)).
  */
object Mmr {

  /** @return (rnk 1..k, id, qsim) — the greedy MMR selection from the
    * top-`shortlist` candidates by gridded-integer query similarity. */
  def diversifiedTopK(corpus: DataFrame, idCol: String, vecCol: String,
                      probe: Array[Float], k: Int, shortlist: Int,
                      gridBits: Int = 14): DataFrame = {
    require(k >= 1 && shortlist >= k, s"bad k=$k shortlist=$shortlist")
    val spark = corpus.sparkSession
    val scale = 1L << gridBits
    val qGrid = probe.map(v => math.floor(v.toDouble * scale).toLong)
    val qLit = typedlit(qGrid.toSeq)
    val gridded = corpus.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => floor(x.cast("double") * lit(scale)).cast("long"))
        .as("g"))
      .withColumn("qsim", aggregate(zip_with(lit(qLit), col("g"), _ * _),
        lit(0L), (acc, v) => acc + v))
    // corpus pass: k-heap per task, driver merges shortlist rows
    val cand = gridded.orderBy(col("qsim").desc, col("id")).limit(shortlist)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val gridOf = cand.map(c => c._1 -> c._2).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (id, qsim)
    val remaining = scala.collection.mutable.LinkedHashMap(cand.map(c => c._1 -> c): _*)
    while (selected.length < math.min(k, cand.length)) {
      val pick =
        if (selected.isEmpty) cand.head // cand already (qsim desc, id) ordered
        else remaining.values.maxBy { case (id, g, qsim) =>
          val maxSel = selected.map(s => dot(g, gridOf(s._1))).max
          (qsim - maxSel, -id) // 2*MMR score with λ=1/2; tie: smaller id
        }
      selected += ((pick._1, pick._3))
      remaining.remove(pick._1)
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, qsim), i) => (i + 1, id, qsim) }
      .toDF("rnk", "id", "qsim")
  }
}
