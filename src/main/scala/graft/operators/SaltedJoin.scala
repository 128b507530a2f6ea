package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * AQE's skew-join split handles sort-merge skew after a shuffle has
  * already materialized the hot partition; explicit salting prevents the
  * hot partition from forming at all, which is the tool of choice when
  * one key holds a double-digit share of a 100 TB fact table.
  *
  * Mechanics: every left row gets a deterministic pseudo-random salt in
  * [0, salts); the (smaller) right side is replicated `salts` times; the
  * shuffle key becomes (key, salt), spreading a hot key over `salts`
  * reducers. Cost: right-side row count × salts — use with a dimension
  * right side, and keep `salts` ≈ the executor-core fan-out you need.
  *
  * The salt is a hash of the whole left row (not a random), so retried
  * tasks produce identical output — required for exactly-once sinks.
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
            salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", "inner").drop("__salt")
  }
}
