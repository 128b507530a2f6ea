package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Precision-recall summary + threshold operating points for a binary
  * label scored by an integer metric — the CLASS-IMBALANCE companion
  * to q201's ROC-AUC: AUC is blind to prevalence (a 0.99-AUC filter
  * can still be 20% precision at any usable recall when positives are
  * 1/10⁴ — exactly the regime of quality/PII/decontamination filters
  * over a 100 TB corpus); average precision and the best-F1 operating
  * point answer the question the curator actually asks: "which
  * threshold do I SET, and what precision do I get there". Youden's J
  * (= TPR − FPR, the two-sample KS between positive and negative
  * score distributions) is reported beside it as the
  * prevalence-free operating point.
  *
  * Definitions (threshold semantics: predict positive when
  * score ≥ t, thresholds = distinct scores, tie groups atomic):
  * AP = Σ_t ΔR_t · P_t (the step form, group-level), best-F1/J
  * argmax break ties toward the HIGHER threshold (the conservative
  * release choice: fewer predicted positives for the same metric).
  *
  * Exactness: the census counts are exact; per-threshold metrics are
  * exact-integer ratios evaluated once in doubles; the AP terms
  * accumulate as DECIMAL(38,12) (the chiSquare house idiom —
  * order-independent where double addition is not).
  *
  * Scale shape: ONE map-side-combined census onto the distinct-score
  * grid (domain-bounded, 2¹⁶ cap — wider score domains pre-bucket);
  * cumsum windows and both argmaxes run on the grid. */
object PrCurve {

  /** One row: (n, pos, ap, best_f1, best_f1_threshold, youden_j,
    * youden_threshold). labelCol boolean; scoreCol integer-scaled. */
  def operatingPoint(df: DataFrame, labelCol: String,
                     scoreCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val st = df.schema(scoreCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(st),
      s"operatingPoint: scoreCol '$scoreCol' is $st — integer-scaled only")
    val u = df.filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
    val spark = df.sparkSession
    Pinned.withCheckpoint(
      u.groupBy(col("__s")).agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__p"))
    ) { cs =>
      val grid = cs.count()
      require(grid >= 1 && grid <= (1 << 16),
        s"operatingPoint: $grid distinct scores outside [1, 65536] — " +
          "pre-bucket the score (floor(s/scale)) first")
      val t = cs.agg(sum(col("__n")).as("n"), sum(col("__p")).as("p")).head()
      val (n, p) = (t.getLong(0), t.getLong(1))
      require(p > 0 && p < n,
        s"operatingPoint: degenerate label (pos=$p of $n) — both classes " +
          "must be present")
      val w = Window.orderBy(col("__s").desc) // grid-bounded by the require
      val m = cs
        .withColumn("__cn", sum(col("__n")).over(w))
        .withColumn("__cp", sum(col("__p")).over(w))
        .withColumn("__prec",
          col("__cp").cast("double") / col("__cn").cast("double"))
        .withColumn("__rec", col("__cp").cast("double") / lit(p.toDouble))
        .withColumn("__fpr", (col("__cn") - col("__cp")).cast("double") /
          lit((n - p).toDouble))
        .withColumn("__f1", when(col("__cp") > 0,
          lit(2.0) * col("__prec") * col("__rec") /
            (col("__prec") + col("__rec"))).otherwise(lit(0.0)))
        .withColumn("__j", col("__rec") - col("__fpr"))
      val ap = m.agg(sum((col("__p").cast("double") / lit(p.toDouble) *
          col("__prec")).cast("decimal(38,12)")))
        .head().getDecimal(0)
      val bestF1 = m.orderBy(col("__f1").desc, col("__s").desc)
        .select(col("__f1"), col("__s")).head()
      val bestJ = m.orderBy(col("__j").desc, col("__s").desc)
        .select(col("__j"), col("__s")).head()
      spark.range(1).select(lit(n).as("n"), lit(p).as("pos"),
        round(lit(BigDecimal(ap).toDouble), 6).as("ap"),
        round(lit(bestF1.getDouble(0)), 6).as("best_f1"),
        lit(bestF1.getLong(1)).as("best_f1_threshold"),
        round(lit(bestJ.getDouble(0)), 6).as("youden_j"),
        lit(bestJ.getLong(1)).as("youden_threshold"))
    }
  }
}
