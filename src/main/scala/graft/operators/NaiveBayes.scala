package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes in the exact integer-bits idiom — the
  * engine's second trained model ([[Stump]] is the numeric one, this
  * is the text one): per-class token likelihoods with Laplace
  * smoothing, scored as SURPRISAL BITS exactly as [[NgramLm]] scores
  * bigrams — s(w|c) = bitlen(tok_c + V) − bitlen(cnt_wc + 1), prior
  * bits likewise — so the whole classifier is integer arithmetic end
  * to end. The floor-log2 quantization costs resolution a float
  * log-likelihood keeps, and buys what the gates need: the argmin
  * class decision is a comparison of exact BIGINTs that CANNOT flip
  * across engines or partitionings (a float NB's near-tie argmax sits
  * on libm's last ulp — the exact failure mode the q96/q185 bits
  * discipline exists to kill). Prediction ties break to the smallest
  * class name — deterministic, and an honest statement that the
  * evidence did not separate them.
  *
  * Scale shape: training is one (class, term) map-side-combined count
  * (vocabulary-bounded output) + one class table; scoring explodes the
  * target's tokens once, LEFT-joins the count tables term-keyed (AQE
  * broadcasts while they fit), and reduces per (doc, class) — the
  * NgramLm serve plan with a classes-sized fan-out. */
object NaiveBayes {

  /** (classes: (class, n_docs, tok), likelihood: (class, term, cnt),
    * vocab: |V| over the TRAIN split). */
  final case class Model(classes: DataFrame, likelihood: DataFrame,
                         vocab: Long)

  private def toks(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol), explode(
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
      .as("term"))

  def train(df: DataFrame, idCol: String, textCol: String,
            classCol: String): Model = {
    val labeled = df.filter(col(classCol).isNotNull)
    val t = toks(labeled, idCol, textCol)
      .join(labeled.select(col(idCol), col(classCol).as("__c")), idCol)
    val likelihood = t.groupBy(col("__c").as("class"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val classes = labeled.groupBy(col(classCol).as("class"))
      .agg(count(lit(1)).as("n_docs"))
      .join(likelihood.groupBy(col("class")).agg(sum(col("cnt")).as("tok")),
        Seq("class"), "left")
      .withColumn("tok", coalesce(col("tok"), lit(0L)))
    val v = likelihood.select(col("term")).distinct().count()
    Model(classes, likelihood, v)
  }

  /** Per target doc: (idCol, predicted, bits) — `bits` the winning
    * class's total surprisal (prior + per-token), ties to the
    * lexicographically smallest class. */
  def predict(target: DataFrame, idCol: String, textCol: String,
              model: Model): DataFrame = {
    val nTrain = model.classes.agg(sum(col("n_docs"))).head().getLong(0)
    require(nTrain > 0, "NaiveBayes: empty training split")
    val t = toks(target, idCol, textCol)
    // per (doc, class, term): bitlen(tok_c + V) − bitlen(cnt + 1)
    val perTok = t.crossJoin(broadcast(model.classes))
      .join(model.likelihood, Seq("class", "term"), "left")
      .select(col(idCol), col("class"),
        (length(bin(col("tok") + model.vocab)) -
          length(bin(coalesce(col("cnt"), lit(0L)) + 1L))).cast("long")
          .as("__s"))
      .groupBy(col(idCol), col("class"))
      .agg(sum(col("__s")).as("__tokBits"))
    val prior = model.classes.select(col("class"),
      (length(bin(lit(nTrain))) - length(bin(col("n_docs")))).cast("long")
        .as("__priorBits"))
    // docs with zero tokens still classify — on priors alone
    val all = target.select(col(idCol)).crossJoin(broadcast(prior))
      .join(perTok, Seq(idCol, "class"), "left")
      .select(col(idCol), col("class"),
        (coalesce(col("__tokBits"), lit(0L)) + col("__priorBits")).as("bits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("bits"), col("class"))
    all.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col("class").as("predicted"), col("bits"))
  }
}
