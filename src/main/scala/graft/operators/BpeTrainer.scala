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
  * left-to-right non-overlapping literal replace. Words are
  * represented as space-joined token strings and merged tokens join
  * with '~', so token boundaries stay unambiguous and the merge is one
  * string `replace` — the exact same primitive every SQL engine has,
  * which is what lets the gate's DuckDB oracle replay training
  * verbatim (unrolled step CTEs).
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
        // literal (non-regex) replace-all: left-to-right non-overlapping,
        // the exact semantics of SQL `replace` — which is why the oracle
        // can replay training verbatim
        cur = cur.withColumn("toks",
          call_function("replace", col("toks"), lit(pr), lit(pr.replace(' ', '~'))))
      }
    }
    (merges.toSeq, cur)
  }

  /** Encode a word table (or any space-joined-token column) with a
    * learned merge list, in training order. */
  def applyMerges(df: DataFrame, toksCol: String,
                  merges: Seq[(Int, String)]): DataFrame =
    merges.sortBy(_._1).foldLeft(df) { case (d, (_, pr)) =>
      d.withColumn(toksCol,
        call_function("replace", col(toksCol), lit(pr), lit(pr.replace(' ', '~'))))
    }
}
