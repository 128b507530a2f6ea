package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline BPE vocabulary training — the scale-correct split:
  *
  *  1. ONE distributed pass turns the corpus into (piece, frequency)
  *     counts — pre-tokenize, explode, groupBy. At 100 TB this is the
  *     only stage that touches the data, and it is a plain map-side-
  *     combined aggregation capped to the `maxPieces` most frequent
  *     pieces (frequency-ranked; ties broken lexicographically so the
  *     vocabulary is deterministic across partitionings).
  *  2. The merge loop runs on the driver over that piece-frequency
  *     table (standard practice — the table is vocabulary-sized, not
  *     corpus-sized). Pair counts are maintained incrementally with an
  *     inverted pair→pieces index, so each merge touches only the
  *     pieces containing the winning pair.
  *
  * The result is persisted as ranked merge pairs; [[Bpe]] derives the
  * full vocabulary from them.
  */
object BpeTrainer {

  /** Distributed piece-frequency count (the corpus pass). */
  def pieceCounts(df: DataFrame, textCol: String, maxPieces: Int): Seq[(String, Long)] = {
    val pieceUdf = udf((s: String) => Tokenizer.pieces(s).toSeq)
    df.select(explode(pieceUdf(col(textCol))).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("piece"))
      .limit(maxPieces)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Driver-side merge-rank learning over piece frequencies. Returns the
    * ranked merge list; stops early when no pair repeats `minCount`
    * times. Deterministic: ties on count break on the smaller packed
    * pair id. */
  def learnMerges(pieces: Seq[(String, Long)], numMerges: Int,
                  minCount: Long = 2L): Array[(Int, Int)] = {
    val words: Array[Array[Int]] = pieces.map { case (p, _) =>
      p.getBytes(java.nio.charset.StandardCharsets.UTF_8).map(_ & 0xff)
    }.toArray
    val freq: Array[Long] = pieces.map(_._2).toArray

    def pack(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)

    val pairCount = mutable.LongMap.empty[Long]
    val pairWords = mutable.LongMap.empty[mutable.BitSet]
    def addPair(p: Long, w: Int, f: Long): Unit = {
      pairCount(p) = pairCount.getOrElse(p, 0L) + f
      pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += w
    }
    def pairsOf(ids: Array[Int]): Iterator[Long] =
      (0 until ids.length - 1).iterator.map(i => pack(ids(i), ids(i + 1)))

    words.indices.foreach { w => pairsOf(words(w)).foreach(p => addPair(p, w, freq(w))) }

    val merges = mutable.ArrayBuffer.empty[(Int, Int)]
    var rank = 0
    while (rank < numMerges && pairCount.nonEmpty) {
      // winning pair: max count, tie -> smaller packed id (deterministic)
      var bestP = 0L; var bestC = -1L
      pairCount.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && p < bestP)) { bestP = p; bestC = c }
      }
      if (bestC < minCount) { rank = numMerges } // nothing frequent left
      else {
        val a = (bestP >>> 32).toInt; val b = (bestP & 0xffffffffL).toInt
        val newId = 256 + rank
        merges += ((a, b))
        val touched = pairWords.getOrElse(bestP, mutable.BitSet.empty)
        touched.foreach { w =>
          val old = words(w); val f = freq(w)
          // retract the word's old pair contributions
          pairsOf(old).foreach { p =>
            val c = pairCount(p) - f
            if (c <= 0L) { pairCount -= p; pairWords -= p } else pairCount(p) = c
          }
          // apply the merge left-to-right
          val out = new Array[Int](old.length)
          var src = 0; var dst = 0
          while (src < old.length) {
            if (src < old.length - 1 && old(src) == a && old(src + 1) == b) {
              out(dst) = newId; src += 2
            } else { out(dst) = old(src); src += 1 }
            dst += 1
          }
          words(w) = java.util.Arrays.copyOf(out, dst)
          // add back the new contributions
          pairsOf(words(w)).foreach(p => addPair(p, w, f))
        }
        pairCount -= bestP
        pairWords -= bestP
        rank += 1
      }
    }
    merges.toArray
  }

  /** End-to-end: corpus pass + driver learning. */
  def trainFromCorpus(df: DataFrame, textCol: String, numMerges: Int,
                      maxPieces: Int = 100000): Bpe =
    new Bpe(learnMerges(pieceCounts(df, textCol, maxPieces), numMerges))

  // -- persistence: header line, then one "a b" pair per rank ------------

  def render(merges: Array[(Int, Int)]): String =
    ("graft-bpe v1" +: merges.toSeq.map { case (a, b) => s"$a $b" }).mkString("\n")

  def parseMerges(lines: Iterator[String]): Array[(Int, Int)] = {
    val it = lines.filter(_.nonEmpty)
    val header = if (it.hasNext) it.next() else ""
    require(header.startsWith("graft-bpe"), s"not a graft BPE file: '$header'")
    it.map { l => val Array(a, b) = l.trim.split(" "); (a.toInt, b.toInt) }.toArray
  }

  /** Persist through the Hadoop FS API (works on any cluster storage). */
  def save(spark: SparkSession, path: String, merges: Array[(Int, Int)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(render(merges).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def load(spark: SparkSession, path: String): Bpe = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try new Bpe(parseMerges(scala.io.Source.fromInputStream(in, "UTF-8").getLines()))
    finally in.close()
  }

  /** Regenerates the shipped vocabulary resource:
    * `runMain graft.functions.BpeTrainer <sfDir> <outFile> [numMerges]`.
    * Trained on the synthetic documents corpus; committed so the library
    * is self-contained offline. */
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outFile = args(1)
    val numMerges = if (args.length > 2) args(2).toInt else 2048
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      "graft-bpe-train")
    try {
      // Train over every natural-language-ish string surface in the
      // corpus (documents text plus entity/name/JSON columns) so the
      // vocabulary covers words, identifiers, and digit runs alike.
      val textOf: (String, String) => DataFrame = (tbl, c) =>
        graft.Tables.t(spark, sfDir, tbl).select(col(c).cast("string").as("text"))
      val corpus = Seq(
        textOf("documents", "text"), textOf("part", "p_name"),
        textOf("part", "p_type"), textOf("customer", "c_name"),
        textOf("supplier", "s_name"), textOf("nation", "n_name"),
        textOf("events", "props")).reduce(_ unionByName _)
      val merges = learnMerges(pieceCounts(corpus, "text", 100000), numMerges)
      save(spark, outFile, merges)
      println(s"[bpe-train] wrote ${merges.length} merges to $outFile")
    } finally spark.stop()
  }
}
