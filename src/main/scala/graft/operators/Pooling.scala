package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped elementwise vector pooling — prototype embeddings per class,
  * document embeddings from chunk embeddings, cluster centroids from
  * members (the mean-pooling step of every embedding pipeline).
  *
  * Scale shape: pooling is a typed partial aggregate whose buffer is ONE
  * (dims-wide array, count) pair per (group, task) — the shuffle carries
  * groups×tasks dense buffers, never the n×dims element rows a
  * posexplode→groupBy(group, pos) form would re-shuffle (the same
  * argument as [[graft.search.SimpleKMeans]]'s Lloyd update, which this
  * generalizes to caller-chosen groups). The pooled result is
  * group-cardinality-sized; exploding IT for downstream per-dimension
  * work is driver-trivial.
  */
object Pooling {

  private class FloatVecSumAgg extends Aggregator[
      Seq[Float], (Array[Double], Long), (Seq[Double], Long)] {
    override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)
    override def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) = {
      val s = if (b._1.length == 0) new Array[Double](a.length) else b._1
      var i = 0; while (i < a.length) { s(i) += a(i); i += 1 }
      (s, b._2 + 1)
    }
    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) =
      if (x._1.length == 0) y
      else if (y._1.length == 0) x
      else {
        var i = 0; while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }
    override def finish(r: (Array[Double], Long)): (Seq[Double], Long) = (r._1.toSeq, r._2)
    override def bufferEncoder = ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder = ExpressionEncoder[(Seq[Double], Long)]()
  }

  /** Exact integer variant — elementwise long sums. Integer addition is
    * associative, so the result is bit-identical on any partitioning
    * AND in any other engine: this is the oracle-checkable face of the
    * same dataflow (floats pool through [[meanPool]], whose cross-row
    * float-sum order is engine-defined). */
  private class LongVecSumAgg extends Aggregator[
      Seq[Long], (Array[Long], Long), (Seq[Long], Long)] {
    override def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)
    override def reduce(b: (Array[Long], Long), a: Seq[Long]): (Array[Long], Long) = {
      val s = if (b._1.length == 0) new Array[Long](a.length) else b._1
      var i = 0; while (i < a.length) { s(i) += a(i); i += 1 }
      (s, b._2 + 1)
    }
    override def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) =
      if (x._1.length == 0) y
      else if (y._1.length == 0) x
      else {
        var i = 0; while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }
    override def finish(r: (Array[Long], Long)): (Seq[Long], Long) = (r._1.toSeq, r._2)
    override def bufferEncoder = ExpressionEncoder[(Array[Long], Long)]()
    override def outputEncoder = ExpressionEncoder[(Seq[Long], Long)]()
  }

  /** Mean-pool an `array<float>` column per group: output
    * (groupCols..., pooled array<double>, n). The serve-path form (doc
    * embeddings from chunks, class prototypes); cross-row float sums
    * are order-associative only up to the last ulp, so exactness
    * guarantees live with [[sumPoolLong]]. */
  def meanPool(df: DataFrame, groupCols: Seq[String], vecCol: String,
               outCol: String = "pooled"): DataFrame = {
    val vsum = udaf(new FloatVecSumAgg)
    df.groupBy(groupCols.map(col): _*)
      .agg(vsum(col(vecCol)).as("__sn"))
      .withColumn("n", col("__sn._2"))
      .withColumn(outCol, transform(col("__sn._1"), x => x / col("n")))
      .drop("__sn")
  }

  /** Exact elementwise sums of an `array<long>` column per group:
    * (groupCols..., sums array<long>, n). Deterministic across
    * partitionings and engines — the gate-query face of the pooling
    * dataflow. */
  def sumPoolLong(df: DataFrame, groupCols: Seq[String], vecCol: String,
                  outCol: String = "sums"): DataFrame = {
    val vsum = udaf(new LongVecSumAgg)
    df.groupBy(groupCols.map(col): _*)
      .agg(vsum(col(vecCol)).as("__sn"))
      .withColumn("n", col("__sn._2"))
      .withColumn(outCol, col("__sn._1"))
      .drop("__sn")
  }
}
