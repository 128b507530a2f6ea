package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) — rows not strictly dominated on a set of
  * maximized numeric criteria.
  *
  * The multi-criteria "best trade-offs" query (Börzsönyi, Kossmann,
  * Stocker, "The Skyline Operator", ICDE 2001): newest AND highest-value
  * orders, longest AND rarest documents — any monotone preference
  * combination. Minimized criteria are passed negated by the caller.
  *
  * Row b dominates row a iff b ≥ a on every criterion and b > a on at
  * least one; equal rows never dominate each other, so exact duplicates
  * all survive (matching the SQL `NOT EXISTS` dominance oracle).
  *
  * Scale shape — the naive formulation is a self-join (O(n²) compare
  * shuffle, hopeless at 100 TB). Instead the classic two-phase prune:
  *
  *   1. a NARROW per-partition pass keeps only each partition's local
  *      frontier (a row dominated locally is dominated globally — the
  *      dominator travels with it); random-order data keeps local
  *      frontiers polylog-sized, and each partition's buffer is bounded
  *      by its own frontier, not its row count;
  *   2. the local frontiers (tiny) shuffle to ONE task for the exact
  *      global frontier — the same "bounded survivors to one place"
  *      shape as the engine's heavy-hitter and CC guards. A frontier
  *      too large to merge on one task means the criteria are nearly
  *      anti-correlated and the skyline IS the table — a modeling
  *      problem no execution strategy fixes; `maxLocalFrontier` turns
  *      that into a loud failure instead of a silent stall.
  */
object Skyline {

  /** Frontier sweep: criteria values pre-extracted per row, so the
    * dominance test never re-reads the Row.
    *
    * `cap` is the SEMANTIC guard and is checked on the POST-SCAN frontier
    * only: the transient prefix frontier may legitimately overshoot it
    * (many buffered survivors later dominated by one row), so failing
    * mid-scan would make success depend on row order. `hardCap` is the
    * MEMORY guard on the transient buffer — generous (the local pass uses
    * a multiple of `cap`; the merge pass passes MaxValue because its
    * input is already bounded by Σ local frontiers). */
  private def frontier(rows: Iterator[(Array[Double], Row)],
                       cap: Int, hardCap: Int): Iterator[(Array[Double], Row)] = {
    val buf = new ArrayBuffer[(Array[Double], Row)]
    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var i = 0
      var strict = false
      while (i < a.length) {
        if (a(i) < b(i)) return false
        if (a(i) > b(i)) strict = true
        i += 1
      }
      strict
    }
    rows.foreach { case (v, r) =>
      var dominated = false
      var i = 0
      while (i < buf.length && !dominated) {
        if (dominates(buf(i)._1, v)) dominated = true else i += 1
      }
      if (!dominated) {
        buf.filterInPlace { case (w, _) => !dominates(v, w) }
        buf += ((v, r))
        require(buf.length <= hardCap,
          s"transient skyline buffer exceeded $hardCap rows — memory " +
            "guard; criteria are anti-correlated enough that even a " +
            "prefix frontier is huge; reconsider the criteria or raise " +
            "maxLocalFrontier")
      }
    }
    require(buf.length <= cap,
      s"skyline frontier exceeded $cap rows — criteria are " +
        "anti-correlated enough that the skyline is the table; " +
        "reconsider the criteria or raise maxLocalFrontier")
    buf.iterator
  }

  /** Skyline of `df` maximizing `cols` (numeric; negate to minimize).
    * Keeps every input column. NULL criteria rows are excluded (NULL is
    * not comparable — same as the SQL oracle's behavior under `>=`). */
  def skyline(df: DataFrame, cols: Seq[String],
              maxLocalFrontier: Int = 100000): DataFrame = {
    require(cols.nonEmpty, "need at least one criterion")
    val enc = Encoders.row(df.schema)
    val idx = cols.map(df.schema.fieldIndex)
    val clean = df.na.drop(cols)
    def values(r: Row): Array[Double] =
      idx.map(i => r.get(i).asInstanceOf[Number].doubleValue()).toArray
    // transient memory guard: 16× the semantic cap (overshoot from
    // later-dominated survivors is real but bounded in practice; a 16×
    // excursion that STAYS is the anti-correlated modeling failure)
    val hard = math.max(maxLocalFrontier,
      math.min(16L * maxLocalFrontier, Int.MaxValue.toLong).toInt)
    val local = clean.mapPartitions { it =>
      frontier(it.map(r => (values(r), r)), maxLocalFrontier, hard).map(_._2)
    }(enc)
    // survivors are frontier-bounded: exact global pass on one task.
    // Its transient buffer is already bounded by Σ local frontiers
    // (≤ partitions × cap), so only the final-result cap applies here.
    local.repartition(1).mapPartitions { it =>
      frontier(it.map(r => (values(r), r)), maxLocalFrontier,
        Int.MaxValue).map(_._2)
    }(enc)
  }
}
