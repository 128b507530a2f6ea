package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_sim

/** k-NN vector search (SURVEY V2/W2, MongoDbService.cs:179-239).
  *
  * The reference runs one probe at a time against the store's vector
  * index; the engine generalizes to batched multi-probe search and keeps
  * the single-probe path a driver-light `TakeOrderedAndProject` plan.
  *
  * Scale design:
  *  - single probe: sim is a codegen'd expression evaluated in one scan
  *    pass; `orderBy(desc).limit(k)` never global-sorts — each task keeps
  *    a k-sized heap and the driver merges (O(partitions·k) rows moved);
  *  - multi probe: probes are broadcast (they are the small side by
  *    construction), the corpus is scanned once, and per-probe top-k is
  *    reduced via a bounded-heap partial aggregate so the shuffle carries
  *    only partitions·probes·k rows — NOT the probes×corpus cross
  *    product. A window variant exists for oracle parity; the aggregator
  *    is the 100-TB path.
  */
object VectorSearch {

  /** Exact brute-force top-k for one probe vector. Ties broken by id. */
  def exactTopK(corpus: DataFrame, vecCol: String, idCol: String,
                probe: Array[Float], k: Int): DataFrame =
    corpus
      .withColumn("sim", cosine_sim(col(vecCol), typedlit(probe)))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Multi-probe k-NN join, window form (oracle-parity reference
    * semantics; shuffles probes×corpus rows — fine when probes are few). */
  def knnJoinWindow(probes: DataFrame, probeIdCol: String, probeVecCol: String,
                    corpus: DataFrame, corpusIdCol: String, corpusVecCol: String,
                    k: Int): DataFrame = {
    val p = probes.select(col(probeIdCol).as("probe_id"), col(probeVecCol).as("__pvec"))
    val scored = corpus
      .crossJoin(broadcast(p))
      .withColumn("sim", cosine_sim(col(corpusVecCol), col("__pvec")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col(corpusIdCol))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col(corpusIdCol), col("sim"), col("rn"))
  }

  /** Bounded top-k heap aggregate: the partial-aggregation (map-side
    * combine) form of "ORDER BY sim DESC LIMIT k per group". */
  class TopKAgg(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
      s.sortBy { case (id, sim) => (-sim, id) }.take(k)
    override def zero: Seq[(Long, Double)] = Seq.empty
    override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
      if (b.size == k && { val (lid, lsim) = b.last; a._2 < lsim || (a._2 == lsim && a._1 > lid) }) b
      else trim(b :+ a)
    override def merge(x: Seq[(Long, Double)], y: Seq[(Long, Double)]): Seq[(Long, Double)] =
      trim(x ++ y)
    override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** Multi-probe k-NN join, aggregator form: map-side partial top-k. */
  def knnJoinAgg(probes: DataFrame, probeIdCol: String, probeVecCol: String,
                 corpus: DataFrame, corpusIdCol: String, corpusVecCol: String,
                 k: Int): DataFrame = {
    val p = probes.select(col(probeIdCol).as("probe_id"), col(probeVecCol).as("__pvec"))
    val topk = udaf(new TopKAgg(k))
    corpus
      .crossJoin(broadcast(p))
      .withColumn("sim", cosine_sim(col(corpusVecCol), col("__pvec")))
      .groupBy(col("probe_id"))
      .agg(topk(col(corpusIdCol).cast("long"), col("sim")).as("hits"))
      .select(col("probe_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col("probe_id"),
        col("hit._1").as(corpusIdCol),
        col("hit._2").as("sim"),
        (col("pos") + 1).as("rn"))
  }
}
