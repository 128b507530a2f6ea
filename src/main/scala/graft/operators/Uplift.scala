package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Qini curve / uplift-by-decile evaluation (Radcliffe 2007) — the
  * eval a TARGETING score needs that q266's gains/lift cannot give:
  * gains ranks by response, but a campaign pays for INCREMENTAL
  * conversions, and a score that ranks sure-things first has great
  * gains and zero uplift. Against a randomized arm split:
  *
  *   q(φ) = x_t(φ) − x_c(φ)·n_t(φ)/n_c(φ)
  *
  * at each score-ranked depth φ, with the Qini coefficient the area
  * between the curve and the random diagonal to (1, q(1)).
  *
  * Depth cuts are VALUE boundaries at the decile grid (the q326
  * type-1 convention, desc: the first score value whose descending
  * cumulative count covers d·N/10 — whole tied groups stay together,
  * so reported depths are the actual fractions, not the nominal).
  *
  * Exactness: one per-unit aggregate (the experiment's own unit
  * shuffle), one map-side-combined score census carrying per-arm
  * (n, x), cumulative windows on the census grid, exact-integer
  * decile selection (10·cum ≥ d·N); uplift and the trapezoid fold
  * close in doubles from those integers, in decile order. Integer-
  * scaled scores only; arms 0/1.
  *
  * Output: one row per decile (decile, score_cut, depth, n, n_t, x_t,
  * n_c, x_c, uplift) with qini_coef repeated. */
object Uplift {

  def qini(units: DataFrame, armCol: String, scoreCol: String,
           convCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val st = units.schema(scoreCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(st),
      s"qini: scoreCol '$scoreCol' is $st — integer-scaled only")
    val rows = units.select(col(armCol).cast("int").as("__g"),
        col(scoreCol).cast("long").as("__v"),
        col(convCol).cast("boolean").as("__y"))
      .filter(col("__g").isNotNull && col("__v").isNotNull &&
        col("__y").isNotNull)
    require(rows.filter(col("__g") =!= 0 && col("__g") =!= 1).isEmpty,
      "qini: armCol must be 0/1")
    val spark = units.sparkSession
    Pinned.withCheckpoint(rows.groupBy(col("__v"))
      .agg(sum(when(col("__g") === 1, 1L).otherwise(0L)).as("__nt"),
        sum(when(col("__g") === 1 && col("__y"), 1L).otherwise(0L))
          .as("__xt"),
        sum(when(col("__g") === 0, 1L).otherwise(0L)).as("__nc"),
        sum(when(col("__g") === 0 && col("__y"), 1L).otherwise(0L))
          .as("__xc"))
    ) { census =>
      val w = Window.orderBy(col("__v").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = census
        .withColumn("__cn",
          sum(col("__nt") + col("__nc")).over(w))
        .withColumn("__cnt", sum(col("__nt")).over(w))
        .withColumn("__cxt", sum(col("__xt")).over(w))
        .withColumn("__cnc", sum(col("__nc")).over(w))
        .withColumn("__cxc", sum(col("__xc")).over(w))
      val tot = census.agg(
        sum(col("__nt") + col("__nc")).as("n"),
        sum(col("__nt")).as("nt"), sum(col("__nc")).as("nc")).head()
      val n = tot.getLong(0)
      require(n > 0, "qini: no units")
      require(tot.getLong(1) > 0 && tot.getLong(2) > 0,
        "qini: both arms must be populated")
      import spark.implicits._
      val deciles = (1L to 10L).toDF("decile")
      // first (deepest-score) cut whose coverage reaches d*N/10 —
      // min by cumulative count picks it; exact integer decision
      val cuts = cum.crossJoin(broadcast(deciles))
        .filter(col("__cn") * 10 >= col("decile") * n)
        .groupBy(col("decile"))
        .agg(min(struct(col("__cn"), col("__v"), col("__cnt"),
          col("__cxt"), col("__cnc"), col("__cxc"))).as("__cut"))
        .select(col("decile"), col("__cut.__v").as("score_cut"),
          col("__cut.__cn").as("n"), col("__cut.__cnt").as("n_t"),
          col("__cut.__cxt").as("x_t"), col("__cut.__cnc").as("n_c"),
          col("__cut.__cxc").as("x_c"))
        .orderBy(col("decile"))
      val cells = Grids.collectBounded(cuts, "qini decile grid",
        maxRows = 10).collect()
      def uplift(r: org.apache.spark.sql.Row): Double = {
        val (xt, ncn, ntn, xc) = (r.getLong(4), r.getLong(5),
          r.getLong(3), r.getLong(6))
        if (ncn == 0) xt.toDouble
        else xt.toDouble - xc.toDouble * ntn.toDouble / ncn.toDouble
      }
      // trapezoid area between the curve (through the origin) and the
      // random diagonal to (1, q_total), folded in decile order
      var area = 0.0; var prevQ = 0.0; var prevPhi = 0.0
      cells.foreach { r =>
        val q = uplift(r)
        val phi = r.getLong(2).toDouble / n.toDouble
        area += (prevQ + q) / 2.0 * (phi - prevPhi)
        prevQ = q; prevPhi = phi
      }
      val qTotal = uplift(cells.last)
      val qini = area - qTotal / 2.0
      import scala.jdk.CollectionConverters._
      val out = cells.map { r =>
        org.apache.spark.sql.Row(r.getLong(0), r.getLong(1),
          r.getLong(2).toDouble / n.toDouble, r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), uplift(r), qini)
      }
      import org.apache.spark.sql.types.{StructType, StructField,
        DoubleType}
      spark.createDataFrame(out.toSeq.asJava, StructType(Seq(
        StructField("decile", LongType),
        StructField("score_cut", LongType),
        StructField("depth", DoubleType),
        StructField("n", LongType), StructField("n_t", LongType),
        StructField("x_t", LongType), StructField("n_c", LongType),
        StructField("x_c", LongType),
        StructField("uplift", DoubleType),
        StructField("qini_coef", DoubleType))))
        .select(col("decile"), col("score_cut"),
          round(col("depth"), 6).as("depth"), col("n"), col("n_t"),
          col("x_t"), col("n_c"), col("x_c"),
          round(col("uplift"), 6).as("uplift"),
          round(col("qini_coef"), 6).as("qini_coef"))
        .orderBy(col("decile"))
    }
  }
}
