package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal — the CCNet/jusText curation step
  * at segment granularity: text that repeats VERBATIM across many
  * documents (navigation chrome, cookie banners, license footers,
  * templated headers) carries no training signal and skews n-gram
  * statistics, but the documents CONTAINING it are not duplicates — so
  * doc-level dedup (q40–q43) keeps them, and only a sub-document pass
  * can clean them. Documents split into fixed-width word SEGMENTS; a
  * segment whose document frequency reaches `minDf` is boilerplate;
  * output is each document re-composed WITHOUT its boilerplate
  * segments, with loud per-doc accounting (`n_seg`, `n_dropped`) so a
  * threshold that guts a source is visible, not silent.
  *
  * Fixed-width segments (vs sentences) make the pass deterministic on
  * unpunctuated text and give the df table a clean identity: equal
  * segments are equal strings. The q100 span-dedup operator removes
  * REPEATS WITHIN a doc pair; this removes segments COMMON ACROSS the
  * corpus — different axis, composable.
  *
  * Scale shape: segmenting is a pure narrow projection
  * (`transform(sequence)` + `slice` — zero shuffle); the df table is
  * one (segment → distinct-doc count) aggregate — the SAME cost class
  * as the dedup shingle pass, bounded by corpus tokens / segWords; the
  * hot-segment set (df ≥ minDf) is small by the same counting argument
  * as the q204 hot items (each costs ≥ minDf segment-slots), so it
  * broadcasts into a `left_anti`; recomposition is one per-doc
  * aggregate with segments re-joined in index order (sorted-struct
  * fold — partitioning-invariant). */
object Boilerplate {

  /** The shared segmentation: (__id, __idx, __seg) — one row per
    * fixed-width word segment, in document order. */
  private[graft] def segments(df: DataFrame, idCol: String, textCol: String,
                              segWords: Int): DataFrame = {
    val toks = filter(split(col(textCol), " "), w => w =!= "")
    val nSeg = ceil(size(toks).cast("double") / segWords).cast("int")
    // sequence(0, -1) DESCENDS in Spark (the resampleByRowWeight
    // lesson): an empty doc must yield an empty segment array
    val segArr = when(nSeg > 0, transform(sequence(lit(0), nSeg - 1),
      i => concat_ws(" ", slice(toks, i * segWords + 1, lit(segWords)))))
      .otherwise(array())
    df.select(col(idCol).as("__id"), posexplode(segArr).as(Seq("__idx", "__seg")))
  }

  /** Re-compose each doc WITHOUT the segments in `hot` (one column
    * `__seg`): (idCol, clean_text, n_seg, n_dropped). The empty doc
    * stays present with n_seg = 0 via the doc-level totals. */
  private[graft] def removeAgainst(df: DataFrame, idCol: String, textCol: String,
                                   segWords: Int, hot: DataFrame): DataFrame = {
    val toks = filter(split(col(textCol), " "), w => w =!= "")
    val nSeg = ceil(size(toks).cast("double") / segWords).cast("int")
    val segs = segments(df, idCol, textCol, segWords)
    val kept = segs.join(broadcast(hot.select(col("__seg"))), Seq("__seg"), "left_anti")
    val totals = df.select(col(idCol).as("__id"), nSeg.cast("long").as("n_seg"))
    totals
      .join(kept.groupBy(col("__id"))
        .agg(array_sort(collect_list(struct(col("__idx"), col("__seg")))).as("__ps")),
        Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(concat_ws(" ", expr("transform(__ps, p -> p.__seg)")), lit(""))
          .as("clean_text"),
        col("n_seg"),
        (col("n_seg") - coalesce(size(col("__ps")), lit(0)).cast("long")).as("n_dropped"))
  }

  /** (idCol, clean_text, n_seg, n_dropped) — `clean_text` is the doc
    * with boilerplate segments removed (empty string if everything
    * dropped). */
  def removeRepeatedSegments(df: DataFrame, idCol: String, textCol: String,
                             segWords: Int = 10, minDf: Long = 5L): DataFrame = {
    require(segWords >= 1, s"bad segWords=$segWords")
    require(minDf >= 2, s"minDf must be >= 2 (1 would drop everything), got $minDf")
    val hot = segments(df, idCol, textCol, segWords)
      .groupBy(col("__seg"))
      .agg(countDistinct(col("__id")).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__seg"))
    removeAgainst(df, idCol, textCol, segWords, hot)
  }

  /** The segments a `minDf` threshold flags, with their df — the loud
    * accounting face (the q204 `hotItems` idiom). */
  def repeatedSegments(df: DataFrame, idCol: String, textCol: String,
                       segWords: Int = 10, minDf: Long = 5L): DataFrame = {
    val toks = filter(split(col(textCol), " "), w => w =!= "")
    val nSeg = ceil(size(toks).cast("double") / segWords).cast("int")
    val segArr = when(nSeg > 0, transform(sequence(lit(0), nSeg - 1),
      i => concat_ws(" ", slice(toks, i * segWords + 1, lit(segWords)))))
      .otherwise(array())
    df.select(col(idCol).as("__id"), explode(segArr).as("segment"))
      .groupBy(col("segment")).agg(countDistinct(col("__id")).as("df"))
      .filter(col("df") >= minDf)
  }
}
