package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding class-separability audit — the Fisher criterion per class
  * (Fisher 1936's discriminant ratio, class-wise): how far each
  * class's centroid sits from the corpus centroid, relative to the
  * class's own spread. The embedding-quality eval that needs no
  * classifier: an encoder whose classes collapse (ratio → 0) will not
  * retrieve or cluster, whatever the loss curve said — and a single
  * class whose ratio craters after a re-embed is the regression
  * q214's centroid drift localizes in time, localized in LABEL space.
  *
  * Exactness (the q214/q215 grid discipline, pushed through the
  * scatter algebra): vectors quantize to the 2^gridBits integer grid;
  * per class the sufficient statistics are the exact integer sum
  * vector S_c, count n_c, and squared-norm total Q_c = Σ‖x‖²; then
  *
  *   within_num  = n_c·Q_c − ‖S_c‖²                 (= n_c²·avg within-scatter)
  *   between_num = ‖S_c·N − S·n_c‖²                 (= (n_c·N)²·‖μ_c − μ‖²)
  *   fisher      = (between_num · n_c²) / (within_num · (n_c·N)²)
  *               = ‖μ_c − μ‖² / (within-scatter / n_c)
  *
  * — the numerators are exact DECIMAL(38,0) (the cross-sum components
  * reach n·2^g·N ≈ 10¹¹ and SQUARE past 2⁶³, so BIGINT would silently
  * wrap; 38 digits hold through corpus ≈ 10⁹ at gridBits 20), and the
  * closing ratio is one fixed double expression — engine-identical.
  * A one-point class has no within-scatter: fisher NULL, not ∞.
  *
  * Scale shape: one narrow quantize + posexplode into a map-side-
  * combined (class, dim) aggregate (shuffle = classes×dims rows);
  * corpus sums reduce FROM the class sums; the closing folds run on
  * class-cardinality rows with dims-length arrays, in sorted dim
  * order. */
object Separability {

  /** (label, n, q_total, within_num, between_num, fisher). */
  def fisherPerClass(df: DataFrame, labelCol: String, vecCol: String,
                     gridBits: Int = 20): DataFrame = {
    require(gridBits >= 1 && gridBits <= 30, s"bad gridBits=$gridBits")
    val grid = 1L << gridBits
    val q = df.select(col(labelCol).as("__l"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * grid).cast("long"))).as(Seq("__p", "__q")))
    val perDim = q.groupBy(col("__l"), col("__p"))
      // q² fits BIGINT but its corpus-scale SUM does not (n·d·2^2g) —
      // accumulate the squares in DECIMAL from the start
      .agg(sum(col("__q")).as("__s"),
        sum((col("__q") * col("__q")).cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("__qq"),
        count(lit(1)).as("__cnt"))
    val cls = perDim.groupBy(col("__l"))
      .agg(array_sort(collect_list(struct(col("__p"), col("__s")))).as("__ps"),
        sum(col("__qq")).as("q_total"),
        first(col("__cnt")).as("n"))
      .select(col("__l"), col("n"), col("q_total"),
        expr("transform(__ps, p -> p.__s)").as("__sums"))
    val corpus = cls
      .agg(array_sort(collect_list(struct(col("__l"), col("__sums")))).as("__all"),
        sum(col("n")).as("__nn"))
      .select(col("__nn"),
        // corpus sum vector = elementwise Σ over class sum vectors, in
        // sorted class order (exact integers — order is immaterial but
        // pinned anyway)
        expr("""aggregate(__all, CAST(NULL AS ARRAY<BIGINT>),
                (acc, c) -> CASE WHEN acc IS NULL THEN c.__sums
                            ELSE zip_with(acc, c.__sums, (a, b) -> a + b) END)""")
          .as("__csums"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    cls.crossJoin(broadcast(corpus))
      .withColumn("__s2", // ‖S_c‖² exact
        expr("""aggregate(__sums, CAST(0 AS DECIMAL(38,0)),
                (acc, x) -> CAST(acc + CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))
                  AS DECIMAL(38,0)))"""))
      .withColumn("__b2", // ‖S_c·N − S·n_c‖² exact
        expr("""aggregate(zip_with(__sums, __csums,
                  (sc, s) -> CAST(sc AS DECIMAL(38,0)) * CAST(__nn AS DECIMAL(38,0))
                           - CAST(s AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))),
                CAST(0 AS DECIMAL(38,0)),
                (acc, d) -> CAST(acc + d * d AS DECIMAL(38,0)))"""))
      .withColumn("within_num", (dec(col("n")) * dec(col("q_total")) - col("__s2"))
        .cast("decimal(38,0)"))
      .withColumn("between_num", col("__b2"))
      .select(col("__l").as(labelCol), col("n"), col("q_total"),
        col("within_num"), col("between_num"),
        when(col("within_num") === 0, lit(null).cast("double"))
          .otherwise(
            (col("between_num").cast("double") * col("n").cast("double") *
              col("n").cast("double")) /
              (col("within_num").cast("double") *
                (col("n") * col("__nn")).cast("double") *
                (col("n") * col("__nn")).cast("double"))).as("fisher"))
  }
}
