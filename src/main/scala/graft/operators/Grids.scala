package graft.operators

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame

/** Driver-side re-emit of a grid-bounded result, with the bound ENFORCED.
  *
  * House pattern (see [[Pinned]]): operators that pin a corpus census and
  * close on a bounded grid re-emit the grid-sized result as a LOCAL
  * DataFrame so the pin can release before returning. That collect is safe
  * ONLY because the grid is bounded by contract — a continuous column used
  * as a class/stratum/period key silently turns the "grid" corpus-sized
  * and the collect into a driver OOM. This helper makes the contract a
  * loud refusal instead of a heap dump: it collects at most `maxRows + 1`
  * rows (a LIMIT — the driver never holds more than the cap regardless of
  * input size) and refuses when the bound is exceeded. */
object Grids {

  /** The house default — generous for any real class/stratum/time grid,
    * far below anything that could stress a driver. */
  val DefaultMaxRows: Int = 1 << 16

  def collectBounded(out: DataFrame, what: String,
                     maxRows: Int = DefaultMaxRows): DataFrame = {
    val rows = out.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what: grid exceeded $maxRows rows — refusing the driver-side " +
        "re-emit (is a continuous column being used as the grid key?)")
    out.sparkSession.createDataFrame(rows.toSeq.asJava, out.schema)
  }
}
