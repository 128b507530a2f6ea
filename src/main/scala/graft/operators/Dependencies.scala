package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dependency profiling — the two schema-level audits an ingest
  * pipeline runs before trusting a landed table (Papenbrock et al.,
  * VLDB 2015 survey the batch algorithms; these are the streaming-
  * friendly census forms):
  *
  *  - FUNCTIONAL dependencies A→B ("does det determine dep?"), graded
  *    by the standard g₃ error: the minimum fraction of rows to delete
  *    for the FD to hold exactly (Kivinen & Mannila 1995) — per det
  *    key that is n(key) − majority(key), summed.
  *  - INCLUSION dependencies R.k ⊆ S.k ("is every child key present in
  *    the parent?") — the referential-integrity audit; orphans are the
  *    join-loss a downstream enrichment silently pays.
  *
  * All counting is exact integers; the only doubles are the closing
  * ratio columns. NULL determinant rows are excluded (SQL FD semantics:
  * a NULL key determines nothing); NULL dependents form their own
  * class (two rows of (k, NULL) agree; (k, NULL) vs (k, x) violate).
  *
  * Scale shape (fdAudit): ONE corpus scan no matter how many candidate
  * FDs — each row explodes into |fds| (fd, det, dep) triples that feed
  * one map-side-combined census keyed (fd, det, dep); everything after
  * runs on census rows. The per-fd result is |fds|-bounded.
  * Scale shape (inclusionAudit): one child-key census + one distinct
  * on the parent key, then a keys-only left-anti join (AQE broadcasts
  * the side that fits); counts close map-side. Neither side's payload
  * columns ever shuffle. */
object Dependencies {

  /** g₃-graded FD audit: one row per candidate (det → dep) with
    * (fd, n_rows, n_keys, n_violating_keys, n_violations, g3_error,
    * holds). */
  def fdAudit(df: DataFrame, fds: Seq[(String, String)]): DataFrame = {
    require(fds.nonEmpty, "fdAudit: no candidate FDs")
    require(fds.forall { case (a, b) => a != b },
      "fdAudit: trivial FD det->det")
    val triples: Seq[Column] = fds.map { case (det, dep) =>
      struct(lit(s"$det->$dep").as("fd"),
        col(det).cast("string").as("det"),
        col(dep).cast("string").as("dep"))
    }
    df.select(explode(array(triples: _*)).as("__p"))
      .select(col("__p.fd").as("fd"), col("__p.det").as("det"),
        col("__p.dep").as("dep"))
      .filter(col("det").isNotNull)
      .groupBy(col("fd"), col("det"), col("dep"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("fd"), col("det"))
      .agg(sum(col("__c")).as("__n"), max(col("__c")).as("__mx"),
        count(lit(1)).as("__dd"))
      .groupBy(col("fd"))
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("__dd") > 1, 1L).otherwise(0L))
          .as("n_violating_keys"),
        sum(col("__n") - col("__mx")).as("n_violations"))
      .withColumn("g3_error",
        round(col("n_violations").cast("double") /
          col("n_rows").cast("double"), 6))
      .withColumn("holds", col("n_violations") === 0L)
      .orderBy(col("fd"))
  }

  /** Financial reconciliation audit — the cross-table consistency
    * check [[fdAudit]] (within-table) and [[inclusionAudit]] (key
    * presence) leave open: does the child's per-key AMOUNT roll up to
    * the parent's stated total? Every key lands in exactly one band —
    * missing on either side, exact, or the first matching relative-
    * error tier — so the row counts partition the key space and a
    * dashboard can alert on the tail band.
    *
    * Exactness: amounts are integer cents (the caller pre-scales);
    * per-key child sums are exact BIGINTs and every band decision is
    * an integer cross-multiplication (|d|·1000 ≤ |p| for ≤0.1%, etc.)
    * — no float ever decides a band. The only doubles are the closing
    * fractions. A parent key stated more than once is a data bug the
    * audit refuses loudly rather than averages away.
    *
    * Scale shape: one map-side-combined child rollup + one keyed
    * full-outer join with the parent (AQE picks the side); the band
    * census is one aggregate onto 7 rows. */
  def reconcile(child: DataFrame, childKey: String, childCents: String,
                parent: DataFrame, parentKey: String,
                parentCents: String): DataFrame = {
    val bands = Seq("1_child_only", "2_parent_only", "3_exact",
      "4_within_0_1pct", "5_within_1pct", "6_within_10pct",
      "7_beyond_10pct")
    val ck = child
      .select(col(childKey).cast("long").as("__k"),
        col(childCents).cast("long").as("__c"))
      .filter(col("__k").isNotNull && col("__c").isNotNull)
      .groupBy(col("__k")).agg(sum(col("__c")).as("__cc"))
    val pk = parent
      .select(col(parentKey).cast("long").as("__k"),
        col(parentCents).cast("long").as("__p"))
      .filter(col("__k").isNotNull && col("__p").isNotNull)
    val dup = pk.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"reconcile: parent key ${dup.headOption.map(_.getLong(0))
        .getOrElse(-1L)} stated more than once — fix the parent first")
    val joined = ck.join(pk, Seq("__k"), "full_outer")
      .withColumn("__d", abs(col("__cc") - col("__p")))
      .withColumn("band",
        when(col("__p").isNull, bands(0))
          .when(col("__cc").isNull, bands(1))
          .when(col("__d") === 0, bands(2))
          .when(col("__d") * 1000 <= abs(col("__p")), bands(3))
          .when(col("__d") * 100 <= abs(col("__p")), bands(4))
          .when(col("__d") * 10 <= abs(col("__p")), bands(5))
          .otherwise(bands(6)))
    val spark = child.sparkSession
    import spark.implicits._
    val census = joined.groupBy(col("band"))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(col("__d")), lit(0L)).as("abs_diff_cents"))
    val tot = joined.agg(count(lit(1))).head().getLong(0)
    require(tot > 0, "reconcile: both sides empty")
    bands.toDF("band").join(census, Seq("band"), "left")
      .select(col("band"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        coalesce(col("abs_diff_cents"), lit(0L)).as("abs_diff_cents"),
        round(coalesce(col("n_keys"), lit(0L)).cast("double") /
          lit(tot).cast("double"), 6).as("frac"))
      .orderBy(col("band"))
  }

  /** Inclusion / referential-integrity audit: one row
    * (fk, n_child_rows, n_child_keys, n_orphan_keys, n_orphan_rows,
    * coverage) — coverage is the fraction of non-NULL child ROWS whose
    * key exists in the parent (the enrichment-join hit rate). NULL
    * child keys are reported separately upstream of the audit (they
    * can never match; excluded here, the SQL IN semantics). */
  def inclusionAudit(child: DataFrame, childKey: String,
                     parent: DataFrame, parentKey: String,
                     label: String): DataFrame = {
    val ck = child.select(col(childKey).cast("long").as("__k"))
      .filter(col("__k").isNotNull)
      .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
    val pk = parent.select(col(parentKey).cast("long").as("__k"))
      .filter(col("__k").isNotNull).distinct()
    val orphans = ck.join(pk, Seq("__k"), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_orphan_keys"),
        coalesce(sum(col("__c")), lit(0L)).as("n_orphan_rows"))
    val totals = ck.agg(coalesce(sum(col("__c")), lit(0L))
      .as("n_child_rows"),
      coalesce(count(lit(1)), lit(0L)).as("n_child_keys"))
    totals.crossJoin(orphans)
      .select(lit(label).as("fk"), col("n_child_rows"),
        col("n_child_keys"), col("n_orphan_keys"), col("n_orphan_rows"),
        round(when(col("n_child_rows") === 0L, lit(null))
          .otherwise((col("n_child_rows") - col("n_orphan_rows"))
            .cast("double") / col("n_child_rows").cast("double")), 6)
          .as("coverage"))
  }
}
