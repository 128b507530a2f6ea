package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Benchmark decontamination: remove (or flag) training documents that
  * share word n-grams with a held-out evaluation/benchmark set — the
  * standard pre-training hygiene step (n-gram overlap decontamination,
  * as published for GPT-3 §C / Llama-2 §A.6) that the reference has no
  * analog for, but any 100 TB training-data pipeline requires.
  *
  * Scale shape: the benchmark side of the join is small by construction
  * (eval suites are MBs against a 100 TB corpus), so its DISTINCT
  * shingle set broadcasts; the training side streams its shingles
  * through a broadcast-hash semi-match BEFORE any shuffle — the only
  * shuffle is the per-doc aggregation of the (rare) matching shingles.
  * Nothing in the plan is proportional to train×bench.
  */
object Decontaminate {

  /** Training docs that share at least one word n-gram with `bench`,
    * with the count of distinct shared n-grams per doc. Output:
    * (idCol, shared_ngrams), one row per contaminated training doc.
    * Keep-side filtering is the caller's `join(..., "left_anti")`. */
  def sharedNgrams(train: DataFrame, bench: DataFrame,
                   idCol: String, textCol: String, n: Int = 8): DataFrame = {
    // per-doc distinct shingles: (doc, s) rows are unique by construction
    val tr = train
      .transform(Spread.byKey(_, idCol)) // spread shingling (see Dedup.spread)
      .select(col(idCol), explode(array_distinct(shingles(col(textCol), n))).as("s"))
    val bs = bench
      .select(explode(array_distinct(shingles(col(textCol), n))).as("s"))
      .distinct()
    // unhinted: AQE broadcasts the (small) benchmark shingle set; if a
    // huge bench set ever exceeds the broadcast threshold it degrades to
    // a key-partitioned join instead of OOMing the driver
    tr.join(bs, "s")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("shared_ngrams"))
  }
}
