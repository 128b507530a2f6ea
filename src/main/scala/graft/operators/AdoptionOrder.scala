package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adoption-order rules over an event/feature vocabulary — the
  * TEMPORAL direction the co-occurrence family cannot see: q204's
  * itemset confidence and q380's basket cosine are symmetric in time;
  * this asks "of the users who ever did A, how many did A strictly
  * BEFORE their first B" — the natural-funnel read (does signup
  * precede purchase; which feature is the gateway) that drives
  * onboarding-order decisions. Rules are per ordered pair (a, b):
  * support = users with first(a) < first(b), confidence =
  * support / users(a). Same-day first-adoptions are UNORDERED and
  * count for neither direction (the pinned-tie contract — inventing
  * an order would fabricate direction).
  *
  * Exactness: first-adoption days and every count are exact integers;
  * confidence and the both-users baseline are closing divisions.
  *
  * Scale shape: one (user, item) min-day census (map-side combined),
  * one user-keyed self-join (co-partitioned — pairs bound by
  * Σ items_u², with the vocabulary loudly bounded at 2¹⁰), one pair
  * census. Output: every ordered pair with support ≥ minSupport,
  * ordered by (support DESC, a, b). */
object AdoptionOrder {

  /** Rows: (type_a, type_b, n_a, n_b, n_both, n_ordered, confidence,
    * directionality) — `n_both` users adopted both (any order),
    * `n_ordered` strictly a-before-b; directionality =
    * n_ordered/n_both. */
  def rules(events: DataFrame, userCol: String, itemCol: String,
            tsCol: String, minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1, s"rules: minSupport=$minSupport")
    val firsts = events
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull &&
        col(tsCol).isNotNull)
      .groupBy(col(userCol).as("__u"), col(itemCol).cast("string").as("__i"))
      .agg(min(datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
        .cast("long")).as("__d"))
    Pinned.withCheckpoint(firsts) { fs =>
      val vocab = fs.select(col("__i")).distinct().count()
      require(vocab >= 2 && vocab <= (1 << 10),
        s"rules: $vocab items outside [2, 1024] — adoption order is a " +
          "vocabulary-level read; aggregate items first")
      val counts = fs.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
      val pairs = fs.as("a")
        .join(fs.as("b"),
          col("a.__u") === col("b.__u") && col("a.__i") =!= col("b.__i"))
        .groupBy(col("a.__i").as("type_a"), col("b.__i").as("type_b"))
        .agg(count(lit(1)).as("n_both"),
          sum(when(col("a.__d") < col("b.__d"), 1L).otherwise(0L))
            .as("n_ordered"))
      val out = pairs
        .filter(col("n_ordered") >= minSupport)
        .join(broadcast(counts)
          .select(col("__i").as("type_a"), col("__n").as("n_a")), "type_a")
        .join(broadcast(counts)
          .select(col("__i").as("type_b"), col("__n").as("n_b")), "type_b")
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_both"), col("n_ordered"),
          round(col("n_ordered").cast("double") / col("n_a").cast("double"),
            6).as("confidence"),
          round(col("n_ordered").cast("double") /
            col("n_both").cast("double"), 6).as("directionality"))
        .orderBy(col("n_ordered").desc, col("type_a"), col("type_b"))
      Grids.collectBounded(out, "adoption-order pair grid")
    }
  }
}
