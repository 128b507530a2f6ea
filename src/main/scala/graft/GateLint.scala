package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType, ArrayType, MapType, StructField}

/** Gate-output schema lint — the q184/q240 recurrence killer.
  *
  * The driver's correctness hash is dtype-sensitive: a Spark
  * DECIMAL(38,0) parquet column lands in pandas as `object`/decimal
  * while DuckDB's DECIMAL arithmetic materializes as float64, so two
  * digit-identical results hash-mismatch. Exact decimal algebra is
  * fine INSIDE an operator (and encouraged — see
  * [[graft.operators.Separability]]); it must never reach a gate's
  * published projection. This lint walks a gate output schema
  * (including nested arrays/structs/maps) and names every decimal
  * column so [[Verify]] can refuse to dump it and the schema spec can
  * fail the build, loudly, before a round burns on it a third time.
  */
object GateLint {

  /** Dotted paths of every DecimalType leaf in the schema. */
  def decimalColumns(schema: StructType): Seq[String] = {
    def walk(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType     => Seq(path)
      case s: StructType      => s.fields.flatMap(f => walk(f.dataType, s"$path.${f.name}")).toSeq
      case a: ArrayType       => walk(a.elementType, s"$path[]")
      case m: MapType         => walk(m.keyType, s"$path<key>") ++ walk(m.valueType, s"$path<val>")
      case _                  => Nil
    }
    schema.fields.flatMap((f: StructField) => walk(f.dataType, f.name)).toSeq
  }

  /** Throws with a pointed message if the gate schema carries decimals. */
  def assertGateSafe(name: String, schema: StructType): Unit = {
    val bad = decimalColumns(schema)
    require(bad.isEmpty,
      s"gate '$name' publishes DecimalType column(s) ${bad.mkString(", ")} — " +
        "decimal-vs-float64 breaks the driver's dtype-sensitive hash " +
        "(the q184/q240 failure family); cast to DOUBLE (or BIGINT when " +
        "the domain provably fits int64) in the gate projection and " +
        "mirror the cast in the oracle SQL")
  }
}
