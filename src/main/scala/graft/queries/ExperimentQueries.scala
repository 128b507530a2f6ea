package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{Benford, Experiments, FeatureSelect, Isotonic,
  Sharding, Spectral, TrendTests}

/** Round-13 experiment-analysis / audit extensions (q245–q255): score
  * calibration FIX (isotonic PAV), mutual-information feature
  * selection, CUPED variance-reduced A/B lift, Benford first-digit
  * fabrication audit, Krippendorff's α for incomplete annotation,
  * power-iteration top principal component, rendezvous sharding with
  * the grow-by-one placement audit, Mann–Kendall trend test,
  * Theil–Sen robust slope, difference-in-differences, and the
  * Simpson's-paradox stratification audit. House hash-parity rules
  * throughout (identical aliases, exact accumulation, total ORDER BY,
  * doubles only at the closing step). */
object ExperimentQueries extends QuerySet {

  /** Scored/labeled pairs shared by the calibration gates — the q224
    * construction: score = (cos(x, probe 0) + 1)/2, y = same label. */
  private def scored(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
    val probe = e.filter(col("vec_id") === 0).head()
    val pv = probe.getSeq[Float](1).toArray
    val plabel = probe.getInt(2)
    e.select(
      ((graft.functions.VectorFunctions.cosine_sim(col("embedding"), typedlit(pv))
        + 1.0) / 2.0).as("score"),
      (col("label") === plabel).as("y"))
  }

  /** Isotonic calibration of the q224 score — [[Isotonic.pavBinned]]
    * via the declarative minimax form; the oracle replays the
    * bins²-interval grid, which IS the PAV solution (Robertson et al.
    * 1988 §1.2 — spec-pinned equivalent in IsotonicSpec). */
  private def q245(s: SparkSession, d: String): DataFrame =
    Isotonic.pavBinned(scored(s, d), "score", "y", bins = 20)

  private val q245Sql =
    """WITH p AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv,
      |             label AS pl FROM embeddings WHERE vec_id = 0),
      |scored AS (
      |  SELECT (list_cosine_similarity(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE)), p.pv) + 1.0) / 2.0 AS score,
      |    (label = p.pl) AS y
      |  FROM embeddings, p),
      |g AS (
      |  SELECT CAST(least(floor(score * 20), 19) AS INTEGER) AS bin,
      |    COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |  FROM scored GROUP BY bin),
      |cum AS (
      |  SELECT bin, n, pos,
      |    CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
      |    CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
      |  FROM g),
      |ivl AS (
      |  SELECT j.bin AS j, k.bin AS k,
      |    CAST(k.cp - j.cp + j.pos AS DOUBLE) /
      |      CAST(k.cn - j.cn + j.n AS DOUBLE) AS avg
      |  FROM cum j JOIN cum k ON j.bin <= k.bin),
      |mn AS (
      |  SELECT ivl.j, b.bin AS b, MIN(ivl.avg) AS m
      |  FROM ivl JOIN g b ON ivl.j <= b.bin AND ivl.k >= b.bin
      |  GROUP BY ivl.j, b.bin),
      |iso AS (SELECT b, MAX(m) AS iso FROM mn GROUP BY b)
      |SELECT g.bin, g.n, g.pos,
      |  CAST(g.pos AS DOUBLE) / CAST(g.n AS DOUBLE) AS rate, iso.iso
      |FROM g JOIN iso ON iso.b = g.bin
      |ORDER BY g.bin""".stripMargin

  /** Term↔label mutual information over the corpus —
    * [[FeatureSelect.mutualInfo]] against the is-English label; the
    * oracle replays the exact 2×2 counts and the fixed four-term MI
    * tree. */
  private def q246(s: SparkSession, d: String): DataFrame =
    FeatureSelect.mutualInfo(
      t(s, d, "documents").withColumn("is_en", col("lang") === "en"),
      "doc_id", "text", "is_en", topN = 200)

  private val q246Sql =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents),
      |lab AS (SELECT doc_id, (lang = 'en') AS y FROM documents),
      |tot AS (SELECT COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS ny FROM lab),
      |tf AS (
      |  SELECT t.term, COUNT(*) AS df,
      |    CAST(SUM(CASE WHEN lab.y THEN 1 ELSE 0 END) AS BIGINT) AS n11
      |  FROM toks t JOIN lab USING (doc_id) GROUP BY t.term),
      |top AS (SELECT * FROM tf ORDER BY df DESC, term LIMIT 200),
      |c AS (
      |  SELECT term, df, n11, tot.n, tot.ny,
      |    df - n11 AS n10, tot.ny - n11 AS n01,
      |    tot.n - df - tot.ny + n11 AS n00
      |  FROM top, tot)
      |SELECT term, df, n11,
      |  round(
      |    (CASE WHEN n11 > 0 THEN (CAST(n11 AS DOUBLE)/n)
      |       * ln(CAST(n11 AS DOUBLE)*n/(CAST(df AS DOUBLE)*ny)) ELSE 0.0 END)
      |  + (CASE WHEN n10 > 0 THEN (CAST(n10 AS DOUBLE)/n)
      |       * ln(CAST(n10 AS DOUBLE)*n/(CAST(df AS DOUBLE)*(n-ny))) ELSE 0.0 END)
      |  + (CASE WHEN n01 > 0 THEN (CAST(n01 AS DOUBLE)/n)
      |       * ln(CAST(n01 AS DOUBLE)*n/(CAST(n-df AS DOUBLE)*ny)) ELSE 0.0 END)
      |  + (CASE WHEN n00 > 0 THEN (CAST(n00 AS DOUBLE)/n)
      |       * ln(CAST(n00 AS DOUBLE)*n/(CAST(n-df AS DOUBLE)*(n-ny))) ELSE 0.0 END)
      |  , 6) AS mi
      |FROM c ORDER BY term""".stripMargin

  /** CUPED-adjusted A/B lift over the event log — per-user pre/post
    * value sums, hash-assigned arms, [[Experiments.cupedLift]]. The
    * oracle replays the exact decimal sufficient statistics and the
    * closing θ/means tree. */
  private def q247(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").filter(col("ts").isNotNull)
    val cut = lit("2024-01-16").cast("timestamp")
    val perUser = ev.groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts") < cut,
          col("value").cast("decimal(18,6)"))), lit(0).cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("x"),
        coalesce(sum(when(col("ts") >= cut,
          col("value").cast("decimal(18,6)"))), lit(0).cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("y"))
      .withColumn("arm",
        graft.operators.Splits.hashBucket(col("user_id"), 2))
    Experiments.cupedLift(perUser, "x", "y", "arm")
  }

  private val q247Sql =
    """WITH per_user AS (
      |  SELECT user_id,
      |    CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |      THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DECIMAL(19,6)) AS x,
      |    CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |      THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DECIMAL(19,6)) AS y,
      |    CAST(((user_id % 2147483648) * 2654435761) % 4294967296 % 2
      |      AS INTEGER) AS arm
      |  FROM events WHERE ts IS NOT NULL
      |  GROUP BY user_id),
      |tot AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(x) AS DECIMAL(38,12)) AS sx,
      |    CAST(SUM(y) AS DECIMAL(38,12)) AS sy,
      |    CAST(SUM(x*y) AS DECIMAL(38,12)) AS sxy,
      |    CAST(SUM(x*x) AS DECIMAL(38,12)) AS sxx,
      |    CAST(SUM(y*y) AS DECIMAL(38,12)) AS syy
      |  FROM per_user),
      |th AS (
      |  SELECT n, sx,
      |    CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
      |    CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
      |      / (CAST(n * sxx - sx * sx AS DOUBLE)
      |         * CAST(n * syy - sy * sy AS DOUBLE)) AS var_reduction
      |  FROM tot),
      |arms AS (
      |  SELECT arm, COUNT(*) AS n_units,
      |    CAST(SUM(x) AS DECIMAL(38,12)) AS ax,
      |    CAST(SUM(y) AS DECIMAL(38,12)) AS ay
      |  FROM per_user GROUP BY arm)
      |SELECT arm, n_units,
      |  CAST(ax AS DOUBLE) / n_units AS mean_x,
      |  CAST(ay AS DOUBLE) / n_units AS mean_y,
      |  CAST(ay AS DOUBLE) / n_units
      |    - th.theta * (CAST(ax AS DOUBLE) / n_units
      |      - CAST(th.sx AS DOUBLE) / th.n) AS adj_mean_y,
      |  th.theta AS theta, th.var_reduction AS var_reduction
      |FROM arms, th ORDER BY arm""".stripMargin

  /** Benford first-digit audit of event values per type —
    * [[Benford.firstDigitAudit]]: integer digit extraction from exact
    * micro-units, spec-pinned expected probabilities, digit-ordered χ²
    * fold. */
  private def q248(s: SparkSession, d: String): DataFrame =
    Benford.firstDigitAudit(t(s, d, "events"), "event_type", "value")

  private val q248Sql = {
    val pList = Benford.P.mkString("[", ", ", "]")
    s"""WITH micro AS (
       |  SELECT event_type AS src,
       |    CAST(abs(CAST(value AS DECIMAL(18,6)) * 1000000)
       |      AS DECIMAL(38,0)) AS c
       |  FROM events WHERE value IS NOT NULL),
       |digits AS (
       |  SELECT src, CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS d
       |  FROM micro WHERE c >= 1),
       |obs AS (SELECT src, d, COUNT(*) AS o FROM digits GROUP BY src, d),
       |grid AS (
       |  SELECT s.src, dd.d, n.n, COALESCE(obs.o, 0) AS o
       |  FROM (SELECT DISTINCT src FROM digits) s
       |  CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS d) dd
       |  JOIN (SELECT src, COUNT(*) AS n FROM digits GROUP BY src) n USING (src)
       |  LEFT JOIN obs ON obs.src = s.src AND obs.d = dd.d),
       |chi AS (
       |  SELECT src, list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list((CAST(o AS DOUBLE) - n * ($pList)[d])
       |             * (CAST(o AS DOUBLE) - n * ($pList)[d])
       |             / (n * ($pList)[d]) ORDER BY d)),
       |    (a, b) -> a + b) AS chi2
       |  FROM grid GROUP BY src)
       |SELECT g.src, g.d, g.n, g.o,
       |  round(($pList)[g.d], 6) AS benford_p,
       |  round(CAST(g.o AS DOUBLE) / g.n, 6) AS obs_p,
       |  round(chi.chi2, 6) AS chi2
       |FROM grid g JOIN chi USING (src)
       |ORDER BY g.src, g.d""".stripMargin
  }

  /** Krippendorff's α over simulated incomplete annotation — 3 hashed
    * raters, 30% of (doc, rater) cells missing, 20% label corruption
    * (the q223 construction plus missingness — exactly the design
    * Fleiss κ's contract rejects). The oracle replays the exact
    * lcm-scaled rational form. */
  private def q249(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Splits.hashBucket
    val ratings = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), lit(2))).as("rater"))
      .filter(hashBucket(col("doc_id") * 7 + col("rater"), 10) >= 3)
      .withColumn("label",
        when(hashBucket(col("doc_id") * 3 + col("rater"), 10) < 2, lit("zz"))
          .otherwise(col("lang")))
    graft.operators.Agreement.krippendorffAlpha(
      ratings, "doc_id", "rater", "label")
  }

  private val q249Sql =
    """WITH ratings AS (
      |  SELECT doc_id, r.r AS rater,
      |    CASE WHEN ((doc_id * 3 + r.r) % 2147483648) * 2654435761
      |           % 4294967296 % 10 < 2
      |      THEN 'zz' ELSE lang END AS label
      |  FROM documents CROSS JOIN (SELECT unnest([0,1,2]) AS r) r
      |  WHERE ((doc_id * 7 + r.r) % 2147483648) * 2654435761
      |          % 4294967296 % 10 >= 3),
      |cells AS (SELECT doc_id AS i, label AS j, COUNT(*) AS nij
      |          FROM ratings GROUP BY 1, 2),
      |units AS (
      |  SELECT i, CAST(SUM(nij) AS BIGINT) AS m,
      |    CAST(SUM(nij*nij) AS BIGINT) AS sq
      |  FROM cells GROUP BY i HAVING SUM(nij) >= 2),
      |dnum AS (SELECT CAST(SUM((2 // (m-1)) * (m*m - sq)) AS BIGINT) AS d
      |         FROM units),
      |nc AS (SELECT j, CAST(SUM(nij)*2 AS BIGINT) AS nc
      |       FROM cells JOIN units USING (i) GROUP BY j),
      |marg AS (SELECT CAST(SUM(nc) AS BIGINT) AS ns,
      |  CAST(SUM(nc*nc) AS BIGINT) AS snc2, COUNT(*) AS ncat FROM nc),
      |nu AS (SELECT COUNT(*) AS n_units FROM units)
      |SELECT nu.n_units, marg.ncat AS n_categories, ns // 2 AS n_ratings,
      |  CAST(2 AS BIGINT) AS scale, dnum.d AS d_num,
      |  1.0 - CAST((ns - 2) * dnum.d AS DOUBLE)
      |    / CAST(ns*ns - snc2 AS DOUBLE) AS alpha
      |FROM nu, marg, dnum""".stripMargin

  /** Top principal component of the embedding corpus by power
    * iteration — [[Spectral.topComponent]]; the oracle unrolls the 4
    * float32-rounded iterations as CTEs (the q33 k-means replay
    * discipline applied to the power method). */
  private def q250(s: SparkSession, d: String): DataFrame =
    Spectral.topComponent(t(s, d, "embeddings"), "embedding", iters = 4)

  private val q250Sql: String = {
    val dims = 64; val iters = 4
    def iterCte(i: Int): String = {
      val prev = s"v${i - 1}"
      s"""p$i AS (
         |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(list_zip(cent.cv, $prev.vl), z -> z[1] * z[2])),
         |    (a, b) -> a + b) AS proj, cent.cv
         |  FROM cent CROSS JOIN $prev),
         |w$i AS (
         |  SELECT i, SUM(cv[i + 1] * proj) AS w
         |  FROM p$i CROSS JOIN range($dims) t(i) GROUP BY i),
         |n$i AS (
         |  SELECT sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(wl, x -> x * x)), (a, b) -> a + b)) AS nrm, wl
         |  FROM (SELECT list(w ORDER BY i) AS wl FROM w$i)),
         |v$i AS (
         |  SELECT list_transform(wl,
         |      x -> CAST(CAST(x / nrm AS FLOAT) AS DOUBLE)) AS vl,
         |    nrm FROM n$i)""".stripMargin
    }
    s"""WITH raw AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
       |  FROM embeddings),
       |tot AS (SELECT COUNT(*) AS n FROM raw),
       |ms AS (SELECT i, SUM(ev[i + 1]) AS s
       |       FROM raw CROSS JOIN range($dims) t(i) GROUP BY i),
       |mu AS (SELECT list(CAST(CAST(s / tot.n AS FLOAT) AS DOUBLE) ORDER BY i)
       |         AS ml
       |       FROM ms, tot GROUP BY tot.n),
       |cent AS (SELECT list_transform(list_zip(raw.ev, mu.ml), z -> z[1] - z[2])
       |           AS cv
       |         FROM raw, mu),
       |v0 AS (SELECT list_transform(range(1, ${dims + 1}),
       |         x -> CAST(0.125 AS DOUBLE)) AS vl),
       |${(1 to iters).map(iterCte).mkString(",\n")},
       |pvx AS (SELECT t.i + 1 AS i, abs(vl[t.i + 1]) AS a
       |        FROM v$iters CROSS JOIN range($dims) t(i)),
       |pi AS (SELECT MIN(i) AS pi FROM pvx WHERE a = (SELECT MAX(a) FROM pvx)),
       |pvv AS (SELECT CASE WHEN vl[pi.pi] < 0
       |               THEN list_transform(vl, x -> -x) ELSE vl END AS vl, nrm
       |        FROM v$iters, pi),
       |sq AS (SELECT i, SUM(cv[i+1] * cv[i+1]) AS s
       |       FROM cent CROSS JOIN range($dims) t(i) GROUP BY i),
       |tv AS (SELECT CAST(CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |         list(s ORDER BY i)), (a, b) -> a + b) / tot.n AS FLOAT)
       |         AS DOUBLE) AS total_var
       |       FROM sq, tot GROUP BY tot.n)
       |SELECT t.i AS dim, mu.ml[t.i + 1] AS mu, pvv.vl[t.i + 1] AS loading,
       |  CAST(CAST(pvv.nrm / tot.n AS FLOAT) AS DOUBLE) AS eigval,
       |  tv.total_var,
       |  round(CAST(CAST(pvv.nrm / tot.n AS FLOAT) AS DOUBLE) / tv.total_var, 6)
       |    AS var_explained
       |FROM range($dims) t(i), mu, pvv, tot, tv
       |ORDER BY t.i""".stripMargin
  }

  /** Rendezvous placement of the document corpus over 8 shards with
    * the grow-to-9 movement audit — [[Sharding.shardAudit]]; the
    * oracle replays the two-round mix argmax (row_number form — set-
    * equal to the fold by definition of argmax with the same tie
    * rule). */
  private def q251(s: SparkSession, d: String): DataFrame =
    Sharding.shardAudit(t(s, d, "documents"), "doc_id", shards = 8)

  private val q251Sql =
    """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id IS NOT NULL),
      |sc AS (
      |  SELECT id, s.s,
      |    ((xor(((id % 2147483648) * 2654435761) % 4294967296,
      |          (((s.s * 31 + 7) % 2147483648) * 2654435761) % 4294967296))
      |      % 2147483648) * 2654435761 % 4294967296 AS w
      |  FROM ids CROSS JOIN (SELECT unnest(range(9)) AS s) s),
      |a8 AS (SELECT id, s FROM (
      |  SELECT id, s, row_number() OVER
      |    (PARTITION BY id ORDER BY w DESC, s) AS rn
      |  FROM sc WHERE s < 8) WHERE rn = 1),
      |a9 AS (SELECT id, s FROM (
      |  SELECT id, s, row_number() OVER
      |    (PARTITION BY id ORDER BY w DESC, s) AS rn
      |  FROM sc) WHERE rn = 1),
      |per AS (
      |  SELECT a8.s AS shard, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN a9.s = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
      |  FROM a8 JOIN a9 USING (id) GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t, MAX(n) AS mx, COUNT(*) AS k
      |        FROM per)
      |SELECT shard, n, round(CAST(n AS DOUBLE) / t, 6) AS frac, n_moved,
      |  round(CAST(n_moved AS DOUBLE) / t, 6) AS moved_frac,
      |  round(CAST(mx AS DOUBLE) / t, 6) AS max_frac,
      |  round(CAST(mx AS DOUBLE) * k / t, 6) AS balance
      |FROM per, tot ORDER BY shard""".stripMargin

  /** The hourly event-value series both trend gates run on. */
  private def hourly(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").filter(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
        .as("v"))
      .select(floor(unix_timestamp(col("h")) / 3600).cast("long").as("t"),
        col("v"))

  private val hourlyCte =
    """g AS (
      |  SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS v
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1)""".stripMargin

  /** Mann–Kendall trend test over the hourly series —
    * [[TrendTests.mannKendall]]: exact integer S and tie table, one
    * closing double tree. */
  private def q252(s: SparkSession, d: String): DataFrame =
    TrendTests.mannKendall(hourly(s, d), "t", "v")

  private val q252Sql =
    s"""WITH $hourlyCte,
       |s AS (SELECT CAST(SUM(CASE WHEN b.v > a.v THEN 1
       |        WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
       |      FROM g a JOIN g b ON a.t < b.t),
       |ties AS (
       |  SELECT COUNT(*) AS n_tie_groups,
       |    CAST(COALESCE(SUM(tg*(tg-1)*(tg*2+5)), 0) AS BIGINT) AS tie_adj
       |  FROM (SELECT v, COUNT(*) AS tg FROM g GROUP BY v
       |        HAVING COUNT(*) > 1)),
       |n AS (SELECT COUNT(*) AS n FROM g)
       |SELECT n.n, s.s, ties.n_tie_groups, ties.tie_adj,
       |  CAST(n.n*(n.n-1)*(n.n*2+5) - ties.tie_adj AS DOUBLE) / 18.0 AS var_s,
       |  CASE WHEN s.s > 0 THEN CAST(s.s - 1 AS DOUBLE)
       |         / sqrt(CAST(n.n*(n.n-1)*(n.n*2+5) - ties.tie_adj AS DOUBLE) / 18.0)
       |       WHEN s.s < 0 THEN CAST(s.s + 1 AS DOUBLE)
       |         / sqrt(CAST(n.n*(n.n-1)*(n.n*2+5) - ties.tie_adj AS DOUBLE) / 18.0)
       |       ELSE 0.0 END AS z
       |FROM n, s, ties""".stripMargin

  /** Theil–Sen robust slope over the hourly series —
    * [[TrendTests.theilSen]] (two-phase exact-rank median); the
    * oracle's `median` is the same exact-middle definition. */
  private def q253(s: SparkSession, d: String): DataFrame =
    TrendTests.theilSen(hourly(s, d), "t", "v")

  private val q253Sql =
    s"""WITH $hourlyCte,
       |pr AS (SELECT CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
       |         AS slope
       |       FROM g a JOIN g b ON a.t < b.t),
       |cnt AS (SELECT COUNT(*) AS p, (SELECT COUNT(*) FROM g) AS n FROM pr),
       |med AS (SELECT median(slope) AS slope FROM pr),
       |ic AS (SELECT median(CAST(g.v AS DOUBLE) - med.slope * CAST(g.t AS DOUBLE))
       |         AS intercept
       |       FROM g, med)
       |SELECT cnt.n, cnt.p AS n_pairs, med.slope, ic.intercept
       |FROM cnt, med, ic""".stripMargin

  /** Difference-in-differences over the event log — treated = hashed
    * user arm, post = second half of the window;
    * [[Experiments.diffInDiff]]. */
  private def q254(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").filter(col("ts").isNotNull)
      .withColumn("treated",
        graft.operators.Splits.hashBucket(col("user_id"), 2) === 1)
      .withColumn("post", col("ts") >= lit("2024-01-16").cast("timestamp"))
    Experiments.diffInDiff(ev, "value", "treated", "post")
  }

  private val q254Sql =
    """WITH base AS (
      |  SELECT (((user_id % 2147483648) * 2654435761) % 4294967296 % 2 = 1)
      |      AS t,
      |    (ts >= TIMESTAMP '2024-01-16') AS p,
      |    CAST(value AS DECIMAL(18,6)) AS v
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      |cells AS (
      |  SELECT t, p, COUNT(*) AS n, CAST(SUM(v) AS DECIMAL(38,12)) AS s
      |  FROM base GROUP BY t, p)
      |SELECT
      |  MAX(CASE WHEN t AND NOT p THEN n END) AS n_treat_pre,
      |  MAX(CASE WHEN t AND p THEN n END) AS n_treat_post,
      |  MAX(CASE WHEN NOT t AND NOT p THEN n END) AS n_ctrl_pre,
      |  MAX(CASE WHEN NOT t AND p THEN n END) AS n_ctrl_post,
      |  MAX(CASE WHEN t AND NOT p THEN CAST(s AS DOUBLE) / n END) AS treat_pre,
      |  MAX(CASE WHEN t AND p THEN CAST(s AS DOUBLE) / n END) AS treat_post,
      |  MAX(CASE WHEN NOT t AND NOT p THEN CAST(s AS DOUBLE) / n END) AS ctrl_pre,
      |  MAX(CASE WHEN NOT t AND p THEN CAST(s AS DOUBLE) / n END) AS ctrl_post,
      |  (MAX(CASE WHEN t AND p THEN CAST(s AS DOUBLE) / n END)
      |   - MAX(CASE WHEN t AND NOT p THEN CAST(s AS DOUBLE) / n END))
      |  - (MAX(CASE WHEN NOT t AND p THEN CAST(s AS DOUBLE) / n END)
      |     - MAX(CASE WHEN NOT t AND NOT p THEN CAST(s AS DOUBLE) / n END))
      |    AS did
      |FROM cells""".stripMargin

  /** Simpson's-paradox audit: high-value event rate by hashed arm,
    * stratified by event type vs pooled —
    * [[Experiments.simpsonAudit]]. */
  private def q255(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .withColumn("arm",
        graft.operators.Splits.hashBucket(col("user_id"), 2) === 1)
      .withColumn("hi", col("value") > 50.0)
    Experiments.simpsonAudit(ev, "event_type", "arm", "hi")
  }

  private val q255Sql =
    """WITH base AS (
      |  SELECT event_type AS stratum,
      |    (((user_id % 2147483648) * 2654435761) % 4294967296 % 2 = 1) AS a,
      |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS s
      |  FROM events WHERE value IS NOT NULL),
      |strata AS (
      |  SELECT stratum,
      |    CAST(SUM(CASE WHEN NOT a THEN 1 END) AS BIGINT) AS n0,
      |    CAST(SUM(CASE WHEN a THEN 1 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN NOT a THEN s END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN NOT a THEN 1 END) AS DOUBLE) AS rate0,
      |    CAST(SUM(CASE WHEN a THEN s END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN a THEN 1 END) AS DOUBLE) AS rate1
      |  FROM base GROUP BY stratum),
      |pooled AS (
      |  SELECT CAST(SUM(CASE WHEN a THEN s END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN a THEN 1 END) AS DOUBLE)
      |    - CAST(SUM(CASE WHEN NOT a THEN s END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN NOT a THEN 1 END) AS DOUBLE) AS pooled_diff
      |  FROM base)
      |SELECT stratum, n0, n1, rate0, rate1, rate1 - rate0 AS diff,
      |  pooled_diff,
      |  ((rate1 - rate0) IS NOT NULL AND
      |   (((rate1 - rate0) > 0 AND pooled_diff < 0)
      |    OR ((rate1 - rate0) < 0 AND pooled_diff > 0))) AS reversed
      |FROM strata, pooled ORDER BY stratum""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q245_isotonic_calibration", q245, Some(q245Sql)),
    Q("q246_mutual_info", q246, Some(q246Sql)),
    Q("q247_cuped_lift", q247, Some(q247Sql)),
    Q("q248_benford_audit", q248, Some(q248Sql)),
    Q("q249_krippendorff_alpha", q249, Some(q249Sql)),
    Q("q250_power_iteration", q250, Some(q250Sql), headline = true),
    Q("q251_rendezvous_shards", q251, Some(q251Sql)),
    Q("q252_mann_kendall", q252, Some(q252Sql)),
    Q("q253_theil_sen", q253, Some(q253Sql)),
    Q("q254_did_lift", q254, Some(q254Sql)),
    Q("q255_simpson_audit", q255, Some(q255Sql)))
}
