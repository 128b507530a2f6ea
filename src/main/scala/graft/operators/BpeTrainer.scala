package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE vocabulary TRAINING (Sennrich et al. 2016) — learn the merge
  * table from the corpus instead of shipping someone else's: the
  * reference counts tokens with a fixed downloaded vocabulary
  * (SharpToken cl100k_base, ChatService.cs:183-192; that data file is
  * unavailable offline — see PLANS.md), and this operator is the
  * in-engine answer: induce merges from the corpus itself, then encode
  * through the same `TokenCodec` seam.
  *
  * Algorithm (the SentencePiece/HF-tokenizers training shape): ONE
  * corpus pass builds the word-frequency table (Zipf: vocab ≪ tokens);
  * every merge iteration then runs on that vocab-bounded table only —
  * adjacent-pair counts weighted by word frequency, argmax pair
  * (count desc, pair asc — deterministic), merge applied as a
  * boundary-anchored left-to-right literal replace. Words are
  * represented as space-joined token strings and merged tokens join
  * with '~'; the merge replaces ` left right ` (space-delimited on BOTH
  * sides, over the space-padded word) so a pair can only ever match
  * whole tokens — a bare `replace(toks, "h e", "h~e")` would also fire
  * inside "t~h e", corrupting a multi-char token across its boundary.
  * The primitive stays plain string `replace`, which every SQL engine
  * has, so the gate's DuckDB oracle replays training verbatim
  * (unrolled step CTEs).
  *
  * Scale: the corpus is touched exactly once; each of the k iterations
  * aggregates the word table (cached; lineage adds one `replace` per
  * step — for k in the thousands, localCheckpoint every ~50 steps and
  * the cost model still never re-reads the corpus).
  */
object BpeTrainer {

  /** One corpus pass: (word, frequency). */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Character-initialized token representation: "cat" → "c a t". */
  private def charInit(words: DataFrame): DataFrame =
    words.select(concat_ws(" ", split(col("w"), "")).as("toks"), col("cnt"))

  /** Apply one merge to a space-joined token column, anchored to token
    * boundaries: over the space-padded string, ` left right ` →
    * ` left~right `, TWICE, then strip the padding. Why twice reaches
    * the fixpoint: a left-to-right literal replace consumes the match's
    * trailing space, so the immediately following occurrence in a run
    * (`l r l r l r`) loses its leading space and is skipped — but two
    * misses can never be consecutive (a miss consumes nothing, so the
    * next occurrence keeps its padding), hence after pass one every
    * missed occurrence is flanked by merged tokens with both spaces
    * intact, and pass two catches them all. Merging cannot create new
    * occurrences of the same pair (`l~r` is a different symbol), so no
    * third pass is ever needed. Identical semantics in DuckDB's
    * `replace`, which is what lets the oracle replay this verbatim. */
  private[operators] def mergeExpr(toksCol: org.apache.spark.sql.Column,
                                   pr: String): org.apache.spark.sql.Column = {
    val pat = lit(s" $pr ")
    val rep = lit(s" ${pr.replace(' ', '~')} ")
    val padded = concat(lit(" "), toksCol, lit(" "))
    val once = call_function("replace", padded, pat, rep)
    val twice = call_function("replace", once, pat, rep)
    // tokens are non-empty (no internal leading/trailing spaces): trim
    // removes exactly the sentinel padding
    trim(twice)
  }

  /** Learn `numMerges` merges; returns (step, "left right") in training
    * order plus the final word table (toks still space-joined). */
  def train(words: DataFrame, numMerges: Int): (Seq[(Int, String)], DataFrame) = {
    require(numMerges >= 1, s"bad numMerges=$numMerges")
    var cur = charInit(words).cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    for (step <- 1 to numMerges) {
      val arr = split(col("toks"), " ")
      val pairs = cur.select(explode(filter(
          zip_with(arr, slice(arr, 2, 100000), (a, b) =>
            when(b.isNotNull, concat(a, lit(" "), b))),
          _.isNotNull)).as("pr"), col("cnt"))
        .groupBy(col("pr")).agg(sum(col("cnt")).as("c"))
      val top = pairs.orderBy(col("c").desc, col("pr")).limit(1).collect()
      if (top.nonEmpty) {
        val pr = top.head.getString(0)
        merges += ((step, pr))
        cur = cur.withColumn("toks", mergeExpr(col("toks"), pr))
      }
    }
    (merges.toSeq, cur)
  }

  /** Encode a word table (or any space-joined-token column) with a
    * learned merge list, in training order. */
  def applyMerges(df: DataFrame, toksCol: String,
                  merges: Seq[(Int, String)]): DataFrame =
    merges.sortBy(_._1).foldLeft(df) { case (d, (_, pr)) =>
      d.withColumn(toksCol, mergeExpr(col(toksCol), pr))
    }
}
