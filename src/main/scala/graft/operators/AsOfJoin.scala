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
  * Right rows tied on (key, time) are ordered by the full carried payload
  * (struct comparison), so the winner — the last one — is deterministic
  * across runs and partitionings: ties resolve to the greatest payload.
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

    // Working columns must not collide with user columns: withColumn
    // silently REPLACES a same-named column, corrupting the result.
    val taken = (leftCols ++ right.columns).toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !taken.contains(n)).get
    val cT = fresh("__graft_asof_t")
    val cSide = fresh("__graft_asof_side")
    val cCarry = fresh("__graft_asof_carry")
    val cM = fresh("__graft_asof_m")

    val carry = struct(rightCols.map(col): _*)
    val carryType = right.select(carry).schema.head.dataType

    // SQL equi-join semantics: NULL keys never match. The window would
    // group NULL keys together and wrongly pair them, so NULL-key left
    // rows bypass the join (kept, with null payload — left-join shape)
    // and NULL-key right rows are dropped.
    val nullKey = keys.map(col(_).isNull).reduce(_ || _)
    // NULL times get the same SQL-comparison treatment: `right.time <=
    // left.time` is never true when either side is NULL, so NULL-time
    // left rows take the null-payload bypass and NULL-time right rows
    // are dropped — otherwise a NULL right time would sort nulls-first
    // in the window and its payload would be carried into EVERY left
    // row of the key as a phantom match.
    val leftBypass = nullKey || col(leftTime).isNull
    val leftNull = left.filter(leftBypass).select(leftCols.map(col) ++
      rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"$prefix$c")): _*)

    val l = left.filter(!leftBypass)
      .withColumn(cT, col(leftTime))
      .withColumn(cSide, lit(1))
      .withColumn(cCarry, lit(null).cast(carryType))
    val r = right.filter(!nullKey && col(rightTime).isNotNull)
      .select(keys.map(col) :+ col(rightTime).as(cT) :+ carry.as(cCarry): _*)
      .withColumn(cSide, lit(0))

    // unionByName fills the left-payload columns with null on right rows
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // Tiebreak: among right rows sharing (key, time), order by the carried
    // payload so `last` picks a deterministic winner. Left rows carry
    // null; nulls_first keeps them ordered before any right payload at
    // the same (t, side) — irrelevant in practice since side splits them.
    // Skipped when the payload type is unorderable (map fields): those
    // ties stay partition-order-dependent, as documented.
    val orderable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(carryType)
    val ordering =
      if (orderable) Seq(col(cT).asc, col(cSide).asc, col(cCarry).asc_nulls_first)
      else Seq(col(cT).asc, col(cSide).asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn(cM, last(col(cCarry), ignoreNulls = true).over(w))
      .filter(col(cSide) === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"$cM.$c").as(s"$prefix$c")): _*)
      .unionByName(leftNull)
  }

  /** NEAREST-key join (r12): for each left row, the right row with the
    * same key MINIMIZING |right.time − left.time| — the sensor/
    * attribution alignment semantics [[leftAsOf]]'s backward-only rule
    * cannot express (a reading 1 s in the future beats one 2 h in the
    * past). Composed from two as-of passes — backward as-is, forward
    * as backward on NEGATED times (latest −t ≤ −t ⟺ earliest t ≥ t) —
    * then one per-row pick, so the cost envelope is exactly two
    * [[leftAsOf]] union-sort shuffles, still zero row amplification.
    *
    * Determinism: equal-distance ties pick the EARLIER right row (the
    * backward side); same-(key, time) right rows inherit leftAsOf's
    * greatest-payload rule. Times must be numeric (cast timestamps to
    * epoch micros first — negation must be exact).
    *
    * `leftIdCol` must uniquely identify left rows (the two passes
    * re-join on it). Output appends `prefix + c` for each right
    * payload column (NULL when the key has no right rows at all). */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String, leftIdCol: String,
              rightCols: Seq[String], prefix: String = "near_"): DataFrame = {
    require(rightCols.contains(rightTime),
      s"rightCols must include the right time column '$rightTime' (distance needs it)")
    val bwd = leftAsOf(left, right, keys, leftTime, rightTime, rightCols, "__b_")
      .select(col(leftIdCol) +: rightCols.map(c => col(s"__b_$c")): _*)
    val negL = left.withColumn("__negt", -col(leftTime))
    val negR = right.withColumn("__negt", -col(rightTime))
    val fwd = leftAsOf(negL, negR, keys, "__negt", "__negt",
        rightCols, "__f_")
      .select(col(leftIdCol) +: rightCols.map(c => col(s"__f_$c")): _*)
    val db = abs(col(s"__b_$rightTime") - col(leftTime))
    val df_ = abs(col(s"__f_$rightTime") - col(leftTime))
    // backward wins ties and missing-forward; forward only when strictly
    // closer or backward missing
    val useFwd = col(s"__f_$rightTime").isNotNull &&
      (col(s"__b_$rightTime").isNull || df_ < db)
    left.join(bwd, leftIdCol).join(fwd, leftIdCol)
      .select(left.columns.map(col) ++
        rightCols.map(c => when(useFwd, col(s"__f_$c"))
          .otherwise(col(s"__b_$c")).as(s"$prefix$c")): _*)
  }
}
