package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no built-in for.
  *
  * For each left row, appends the payload of the latest right row with the
  * same key and `right.time <= left.time` (inclusive). The classic uses:
  * most-recent-quote-per-trade, latest-profile-before-event, feature
  * snapshotting for training data.
  *
  * Implementation is the single-shuffle union-sort form, NOT a range
  * join: tag both sides, union, and carry the right payload forward with
  * `last(_, ignoreNulls)` over a per-key window ordered by
  * (time, side) — right rows sort before left rows at equal timestamps,
  * which yields the inclusive (`<=`) semantics.
  *
  * Scale: one shuffle on the key (both sides co-partitioned by the same
  * exchange), one per-partition sort, zero row amplification — vs the
  * naive `left.join(right, key && r.ts <= l.ts)` + argmax which
  * materializes every (left, earlier-right) pair. At 100 TB the naive
  * form is quadratic per key; this form is n log n per partition.
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param rightCols right payload columns to append, each emitted as
    *                  `prefix + name` (null when no right row precedes).
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val carry = struct(rightCols.map(col): _*)
    val carryType = right.select(carry).schema.head.dataType

    // SQL equi-join semantics: NULL keys never match. The window would
    // group NULL keys together and wrongly pair them, so NULL-key left
    // rows bypass the join (kept, with null payload — left-join shape)
    // and NULL-key right rows are dropped.
    val nullKey = keys.map(col(_).isNull).reduce(_ || _)
    val leftNull = left.filter(nullKey).select(leftCols.map(col) ++
      rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"$prefix$c")): _*)

    val l = left.filter(!nullKey)
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(carryType))
    val r = right.filter(!nullKey)
      .select(keys.map(col) :+ col(rightTime).as("__t") :+ carry.as("__carry"): _*)
      .withColumn("__side", lit(0))

    // unionByName fills the left-payload columns with null on right rows
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__m", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__m.$c").as(s"$prefix$c")): _*)
      .unionByName(leftNull)
  }
}
