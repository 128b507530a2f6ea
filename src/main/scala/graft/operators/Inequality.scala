package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini concentration index per group — the "how lopsided is my data
  * mix?" audit: token mass concentrated in a handful of documents,
  * event volume concentrated in a few users, order value in a few
  * customers. G = 0 means perfectly even, → 1 means one row holds
  * everything; a corpus curator watches this per source to catch a
  * crawler that collapsed onto one site (Gini, Variabilità e
  * mutabilità, 1912 — the rank-sum formulation).
  *
  *   G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx)   over x sorted ascending
  *
  * Exactness: x must be integer-scaled (tokens, cents); rank comes from
  * a deterministic (x, id) sort, so Σ rank·x and Σx are exact BIGINTs
  * and the single closing division is the only floating point — Gini is
  * bit-stable on any partitioning and SQL-replayable. NULL for groups
  * with Σx = 0.
  *
  * Scale shape: ONE `Exchange(group)` + per-partition sort feeds the
  * rank window; the rank-weighted sums combine map-side. Groups sort on
  * one partition each — per-corpus plural groups (source, lang), not
  * one global group (the q86/q167 caveat, same remedy). */
object Inequality {

  /** (groupCol, n, total, gini) from an integer-scaled value column. */
  def gini(df: DataFrame, groupCol: String, valueCol: String,
           idCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val w = Window.partitionBy(col(groupCol)).orderBy(x.asc, col(idCol).asc)
    df.withColumn("__x", x)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("total"),
        sum(col("__rk") * col("__x")).as("rx"))
      .select(col(groupCol), col("n"), col("total"),
        when(col("total") === 0, lit(null).cast("double"))
          .otherwise(
            (lit(2.0) * col("rx").cast("double") -
              (col("n") + 1).cast("double") * col("total").cast("double")) /
              (col("n").cast("double") * col("total").cast("double")))
          .as("gini"))
  }

  /** Herfindahl–Hirschman concentration of an integer mass column over
    * groups — the CONCENTRATION complement of [[gini]]'s dispersion:
    * gini asks how unequal members are; HHI = Σ shareᵢ² asks how
    * dominated the whole is, and 1/HHI is the "effective number of
    * sources" a mixture REALLY has (the q97 domain-mix audit scalar:
    * 20 configured sources at HHI 0.25 means the corpus behaves like
    * 4). Per group: (group, mass, share, hhi, effective_n) with the
    * hhi/effective_n constants repeated — shares are single divisions
    * of exact BIGINTs, the HHI folds group terms in group order (the
    * q224 discipline). One map-side-combined aggregate; everything
    * after runs on the groups table. */
  def hhi(df: DataFrame, groupCol: String, massCol: String): DataFrame = {
    val m = df.groupBy(col(groupCol).as("__g"))
      .agg(sum(col(massCol).cast("long")).as("mass"))
    val tot = m.agg(sum(col("mass")).as("__t"))
    val withT = m.crossJoin(broadcast(tot))
    val h = withT.agg(aggregate(
      transform(array_sort(collect_list(struct(
        col("__g").cast("string").as("g"),
        (col("mass").cast("double") * col("mass") /
          (col("__t").cast("double") * col("__t"))).as("v")))),
        s => s.getField("v")),
      lit(0.0), (acc, x) => acc + x).as("__hhi"))
    withT.crossJoin(broadcast(h))
      .select(col("__g").as(groupCol), col("mass"),
        round(col("mass").cast("double") / col("__t"), 6).as("share"),
        round(col("__hhi"), 6).as("hhi"),
        round(lit(1.0) / col("__hhi"), 6).as("effective_n"))
      .orderBy(col(groupCol))
  }

  /** Shannon entropy of the group mass distribution — the diversity
    * complement to [[hhi]] (Shannon 1948; Jost 2006 for the
    * effective-number reading): H = −Σ share·ln(share), evenness =
    * H / ln(k) (Pielou 1966; NULL for a single group, where the ratio
    * is 0/0), effective_n = exp(H) (the "how many equally-sized
    * sources is this mix worth" number — exp(H) ≥ 1/HHI always, the
    * Hill-number ordering). A curator targeting a data mixture watches
    * evenness: 1.0 is a perfectly balanced mix, → 0 is single-source
    * collapse.
    *
    * Per group: (group, mass, share, entropy, evenness, effective_n)
    * with the distribution constants repeated. Same exactness rules as
    * [[hhi]]: exact BIGINT masses, shares one division each, the
    * entropy folds group terms in group order (groups-grid-bounded). */
  def entropy(df: DataFrame, groupCol: String, massCol: String): DataFrame = {
    val m = df.groupBy(col(groupCol).as("__g"))
      .agg(sum(col(massCol).cast("long")).as("mass"))
    val tot = m.agg(sum(col("mass")).as("__t"), count(lit(1)).as("__k"))
    val withT = m.crossJoin(broadcast(tot))
    val h = withT.agg(aggregate(
      transform(array_sort(collect_list(struct(
        col("__g").cast("string").as("g"),
        when(col("mass") > 0,
          -(col("mass").cast("double") / col("__t")) *
            log(col("mass").cast("double") / col("__t")))
          .otherwise(lit(0.0)).as("v")))),
        s => s.getField("v")),
      lit(0.0), (acc, x) => acc + x).as("__h"))
    withT.crossJoin(broadcast(h))
      .select(col("__g").as(groupCol), col("mass"),
        round(col("mass").cast("double") / col("__t"), 6).as("share"),
        round(col("__h"), 6).as("entropy"),
        when(col("__k") > 1,
          round(col("__h") / log(col("__k").cast("double")), 6))
          .as("evenness"),
        round(exp(col("__h")), 6).as("effective_n"))
      .orderBy(col(groupCol))
  }

  /** Lorenz curve points over population buckets — the SHAPE behind
    * [[gini]]'s scalar: bucket b of the curve says "the bottom b/k of
    * units hold cum_share of the mass" (the "bottom 50% of customers
    * drive 9% of revenue" read). Buckets come from NTILE over the
    * deterministic (mass, id) total order — exact, engine-replayable.
    *
    * Exactness: per-bucket counts and mass sums are exact BIGINTs off
    * the sorted assignment; shares are closing divisions, 6-dp.
    *
    * Scale shape: one total-order NTILE over the UNIT table (a
    * dimension — customers, parts, sources — never the event corpus;
    * pre-aggregate first) + one bucket census; the cumsum runs on k
    * rows. Output: (bucket, units, mass, mass_share, cum_share). */
  def lorenz(df: DataFrame, valueCol: String, idCol: String,
             buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, s"lorenz: buckets=$buckets")
    val w = Window.orderBy(col(valueCol).cast("long").asc, col(idCol).asc)
    val cells = df
      .filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .withColumn("__b", ntile(buckets).over(w).cast("long"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("units"),
        sum(col(valueCol).cast("long")).as("mass"))
    val tot = cells.agg(sum(col("mass")).as("__m"))
    val wc = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.crossJoin(broadcast(tot))
      .withColumn("__cum", sum(col("mass")).over(wc))
      .select(col("__b").as("bucket"), col("units"), col("mass"),
        round(col("mass").cast("double") / col("__m").cast("double"), 6)
          .as("mass_share"),
        round(col("__cum").cast("double") / col("__m").cast("double"), 6)
          .as("cum_share"))
      .orderBy(col("bucket"))
  }

  /** Between-group decomposable inequality indices — what [[gini]]
    * cannot give: Gini does not decompose additively across a
    * partition, so "how much of the inequality is BETWEEN segments
    * (vs within them)" has no Gini answer. The generalized-entropy
    * family does (Shorrocks 1980): the between-group Theil T
    * (Σ s_g·ln(s_g/p_g), share-weighted), the mean log deviation L
    * (Σ p_g·ln(p_g/s_g), population-weighted — sensitive to poor
    * groups where T is sensitive to rich ones), and the Atkinson
    * ε = 1 index (1 − geomean(μ_g, p_g-weighted)/μ — the normative
    * "welfare loss" form). s_g = mass share, p_g = population share.
    *
    * Exactness: group counts and mass sums are exact BIGINTs off one
    * census; each log term is evaluated once in doubles and
    * accumulated as DECIMAL(38,12) (the chiSquare idiom); exp at the
    * close. Positive-mass groups only — a zero-mass group refuses
    * (ln 0; drop or merge it first, loudly).
    *
    * Scale shape: one map-side-combined census onto the groups grid;
    * all index terms run on k rows (metadata-bounded). */
  def betweenGroups(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val u = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("long").as("__x"))
    val spark = df.sparkSession
    Pinned.withCheckpoint(
      u.groupBy(col("__g"))
        .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    ) { cs =>
      val k = cs.count()
      require(k >= 2 && k <= (1 << 10),
        s"betweenGroups: $k groups outside [2, 1024] — group census " +
          "must be metadata-bounded")
      val bad = cs.filter(col("__s") <= 0).count()
      require(bad == 0,
        s"betweenGroups: $bad group(s) with non-positive mass — the log " +
          "terms are undefined; drop or merge them first")
      val tot = cs.agg(sum(col("__n")).as("__nn"), sum(col("__s")).as("__ss"))
      val terms = cs.crossJoin(broadcast(tot))
        .withColumn("__p", col("__n").cast("double") /
          col("__nn").cast("double"))
        .withColumn("__sh", col("__s").cast("double") /
          col("__ss").cast("double"))
      val r = terms.agg(max(col("__nn")).as("n"), max(col("__ss")).as("mass"),
        sum((col("__sh") * log(col("__sh") / col("__p")))
          .cast("decimal(38,12)")).as("__t"),
        sum((col("__p") * log(col("__p") / col("__sh")))
          .cast("decimal(38,12)")).as("__l"),
        sum((col("__p") * log(col("__s").cast("double") /
          col("__n").cast("double"))).cast("decimal(38,12)")).as("__gm"))
        .head()
      val (n, mass) = (r.getLong(0), r.getLong(1))
      val mu = mass.toDouble / n.toDouble
      val atkinson = 1.0 - math.exp(BigDecimal(r.getDecimal(4)).toDouble) / mu
      spark.range(1).select(lit(k).as("k"), lit(n).as("n"),
        lit(mass).as("mass"),
        round(lit(BigDecimal(r.getDecimal(2)).toDouble), 6).as("theil_t"),
        round(lit(BigDecimal(r.getDecimal(3)).toDouble), 6).as("theil_l"),
        round(lit(atkinson), 6).as("atkinson_1"))
    }
  }
}
