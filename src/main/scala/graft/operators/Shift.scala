package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decile shift function — WHERE in the distribution a change acted:
  * scalar tests (Mann–Whitney, the mean family) say THAT treatment
  * moved the metric; the shift function (Doksum 1974) reports the
  * per-decile displacement q_cur(k/10) − q_ref(k/10), separating "the
  * whole distribution slid" from "only the tail exploded" — the
  * reading that decides between a pricing change and an outlier bug.
  *
  * Exactness: ALL integer arithmetic, no floats anywhere — quantiles
  * are type-1 order statistics (q_k = min v with cum-count ≥
  * ceil(k·n/10), computed from the exact value census's cumulative
  * counts), and shifts are integer differences. Bit-identical in any
  * engine on any partitioning by construction. `valueCol` must be
  * integer-scaled (the levene contract).
  *
  * Scale shape: one map-side-combined (value, side) census; cumulative
  * windows run on the value grid, never the corpus; output is the
  * fixed 9-row decile grid. */
object Shift {

  /** (decile, q_ref, q_cur, shift) for deciles 1..9, ordered. */
  def deciles(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    def checked(df: DataFrame): DataFrame = {
      val vt = df.schema(valueCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
        s"deciles: valueCol '$valueCol' is $vt — integer-scaled only")
      df.select(col(valueCol).cast("long").as("__v"))
        .filter(col("__v").isNotNull)
    }
    val u = checked(ref).withColumn("__s", lit(0))
      .unionByName(checked(cur).withColumn("__s", lit(1)))
    val spark = ref.sparkSession
    Pinned.withCheckpoint(u.groupBy(col("__v"))
      .agg(sum(when(col("__s") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__s") === 1, 1L).otherwise(0L)).as("__cb"))
    ) { cells =>
      require(cells.count() <= Grids.DefaultMaxRows,
        "deciles: value grid exceeds the bound — pre-quantize the " +
          "feature (the ksTwoSample contract)")
      val w = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells
        .withColumn("__cuma", sum(col("__ca")).over(w))
        .withColumn("__cumb", sum(col("__cb")).over(w))
      val tot = cum.agg(max(col("__cuma")).as("na"),
        max(col("__cumb")).as("nb")).head()
      val (na, nb) = (tot.getLong(0), tot.getLong(1))
      require(na > 0 && nb > 0, s"deciles: empty side ($na, $nb)")
      val ks = spark.range(1, 10).select(col("id").as("decile"))
      // rank r_k = ceil(k·n/10) in exact integers: (k·n + 9) div 10
      val out = ks.crossJoin(broadcast(
          cum.select(col("__v"), col("__cuma"), col("__cumb"))
            .agg(collect_list(struct(col("__v"), col("__cuma"),
              col("__cumb"))).as("__cells")))
        )
        .withColumn("__sorted", array_sort(col("__cells")))
        .withColumn("q_ref", element_at(filter(col("__sorted"),
          c => c.getField("__cuma") * 10 >= col("decile") * na), 1)
          .getField("__v"))
        .withColumn("q_cur", element_at(filter(col("__sorted"),
          c => c.getField("__cumb") * 10 >= col("decile") * nb), 1)
          .getField("__v"))
        .select(col("decile"), col("q_ref"), col("q_cur"),
          (col("q_cur") - col("q_ref")).as("shift"))
        .orderBy(col("decile"))
      Grids.collectBounded(out, "decile grid")
    }
  }
}
