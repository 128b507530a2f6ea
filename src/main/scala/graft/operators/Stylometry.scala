package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Burrows' Delta stylometry (Burrows 2002) between corpus sources —
  * the AUTHORSHIP/TEMPLATE-forensics read the drift family cannot
  * give: PSI/KS/TV compare one metric's distribution; Delta compares
  * whole function-word PROFILES. Each source's relative frequency of
  * the corpus's top-M words standardizes per word (z across sources),
  * and Δ(a,b) = mean_w |z_a(w) − z_b(w)|. Two crawls of the same
  * template farm sit at tiny Δ however much their topics differ;
  * a source that switched generators jumps. The standard tool of
  * computational stylometry, repurposed as a source-provenance audit.
  *
  * Exactness: word counts and per-source totals are exact BIGINTs off
  * one tokenize pass (space-split — the q19 contract); frequencies,
  * per-word means/stds and z-scores evaluate in fixed double trees
  * with every cross-row sum accumulated as DECIMAL(38,12). The top-M
  * word list is pinned by (count DESC, word) — a total order. A top
  * word with zero across-source variance refuses (z undefined; lower
  * M or drop the word explicitly).
  *
  * Scale shape: one tokenize+count shuffle keyed (source, word); the
  * top-M join prunes everything else; the z table is sources×M and
  * the pair table sources²×M — metadata-bounded (sources ≤ 256
  * loudly). Output: every source pair (src_a, src_b, delta),
  * ordered by delta. */
object Stylometry {

  def burrowsDelta(docs: DataFrame, textCol: String, groupCol: String,
                   topWords: Int = 30): DataFrame = {
    require(topWords >= 5 && topWords <= 500,
      s"burrowsDelta: topWords=$topWords outside [5, 500]")
    val toks = docs
      .filter(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        explode(split(col(textCol), " ")).as("__w"))
      .filter(col("__w") =!= "")
    Pinned.withCheckpoint(
      toks.groupBy(col("__g"), col("__w")).agg(count(lit(1)).as("__c"))
    ) { cells =>
      val groups = cells.select(col("__g")).distinct()
      val k = groups.count()
      require(k >= 3 && k <= 256,
        s"burrowsDelta: $k sources outside [3, 256]")
      val totals = cells.groupBy(col("__g")).agg(sum(col("__c")).as("__t"))
      val top = cells.groupBy(col("__w")).agg(sum(col("__c")).as("__n"))
        .orderBy(col("__n").desc, col("__w")).limit(topWords)
        .select(col("__w"))
      // full grid: every (source, top word), zero-filled
      val grid = groups.crossJoin(broadcast(top))
        .join(cells, Seq("__g", "__w"), "left")
        .join(broadcast(totals), "__g")
        .withColumn("__c2",
          coalesce(col("__c"), lit(0L)).cast("decimal(38,0)"))
        .withColumn("__f",
          col("__c2").cast("double") / col("__t").cast("double"))
      // EXACT degeneracy test — float variance of equal rationals is
      // not reliably 0: a word is flat iff every source's c/t equals
      // the reference source's (cross-multiplication in exact decimals)
      val refs = grid.groupBy(col("__w"))
        .agg(min(struct(col("__g"), col("__c2").as("c0"),
          col("__t").as("t0"))).as("__r"))
        .select(col("__w"), col("__r.c0").as("__c0"),
          col("__r.t0").as("__t0"))
      val degenerate = grid.join(broadcast(refs), "__w")
        .groupBy(col("__w"))
        .agg(max(abs(col("__c2") * col("__t0") -
          col("__c0") * col("__t"))).as("__dev"))
        .filter(col("__dev") === 0).count()
      require(degenerate == 0,
        s"burrowsDelta: $degenerate top word(s) with zero across-source " +
          "variance — z undefined; lower topWords")
      val stats = grid.groupBy(col("__w"))
        .agg(sum(col("__f").cast("decimal(38,12)")).as("__sf"),
          sum((col("__f") * col("__f")).cast("decimal(38,12)")).as("__sff"))
        .withColumn("__mean", col("__sf").cast("double") / lit(k.toDouble))
        .withColumn("__var", col("__sff").cast("double") / lit(k.toDouble) -
          col("__mean") * col("__mean"))
      // belt to the exact guard's suspenders: a NEAR-flat word whose
      // float variance cancels to <= 0 would put NaN into every delta
      val cancelled = stats.filter(col("__var") <= 0).count()
      require(cancelled == 0,
        s"burrowsDelta: $cancelled top word(s) whose float variance " +
          "cancelled to <= 0 — lower topWords")
      // divide by the ACTUAL marker-word count, not the requested one:
      // limit(topWords) returns fewer words when the corpus vocabulary
      // is smaller, and dividing by topWords would silently deflate
      // delta by the missing-word ratio (r16 advisor finding)
      val nTop = top.count()
      val z = grid.join(broadcast(stats
          .select(col("__w"), col("__mean"), sqrt(col("__var")).as("__sd"))),
        "__w")
        .select(col("__g"), col("__w"),
          ((col("__f") - col("__mean")) / col("__sd")).as("__z"))
      val out = z.as("a")
        .join(z.as("b"),
          col("a.__w") === col("b.__w") && col("a.__g") < col("b.__g"))
        .groupBy(col("a.__g").as("src_a"), col("b.__g").as("src_b"))
        .agg((sum(abs(col("a.__z") - col("b.__z"))
          .cast("decimal(38,12)")).cast("double") /
          lit(nTop.toDouble)).as("__d"))
        .select(col("src_a"), col("src_b"), round(col("__d"), 6).as("delta"))
        .orderBy(col("delta"), col("src_a"), col("src_b"))
      Grids.collectBounded(out, "burrowsDelta source-pair grid")
    }
  }
}
