package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Driver-local parquet writer for METADATA-SCALE commits (guide §5: the
  * driver should do almost no data work — but a 1-row meta table or a
  * 10-row chat-session commit is not data work, and launching a full
  * Spark write job for it costs ~200-900 ms of plan+schedule+commit per
  * call; measured on the q172/q398 profiles this was a fifth of their
  * wall). Writes rows straight through parquet-mr with the exact
  * physical/logical types Spark's own writer would choose for the
  * supported atomic types, so the store's schema-pinned read path
  * (`spark.read.schema(committed)`) is oblivious to which writer
  * produced a segment.
  *
  * Scope is deliberately narrow: rows must already be ON the driver (a
  * LocalRelation plan — never a collect of distributed data) and every
  * field must be an atomic type from the table below; anything else
  * falls back to the Spark write path at the call site. */
object LocalParquet {

  /** Spark → parquet type mapping for the supported atomics (mirrors
    * SparkToParquetSchemaConverter for these types). None = unsupported,
    * caller must fall back. */
  private def parquetField(f: StructField): Option[Type] = {
    val b = f.dataType match {
      case BooleanType => Some(Types.optional(BOOLEAN))
      case IntegerType => Some(Types.optional(INT32))
      case LongType => Some(Types.optional(INT64))
      case FloatType => Some(Types.optional(FLOAT))
      case DoubleType => Some(Types.optional(DOUBLE))
      case StringType => Some(Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()))
      case TimestampType => Some(Types.optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.MICROS)))
      case DateType => Some(Types.optional(INT32)
        .as(LogicalTypeAnnotation.dateType()))
      case _ => None
    }
    b.map(_.named(f.name))
  }

  /** Whether every field of `schema` is writable by this fast path. */
  def supports(schema: StructType): Boolean =
    schema.fields.forall(f => parquetField(f).isDefined)

  private def messageType(schema: StructType): MessageType = {
    val tb = Types.buildMessage()
    schema.fields.foreach(f => tb.addField(parquetField(f).getOrElse(
      throw new IllegalArgumentException(s"unsupported field $f"))))
    tb.named("spark_schema")
  }

  /** Write `rows` as ONE parquet file at `file`. Timestamps are encoded
    * as micros-since-epoch (adjusted to UTC), dates as epoch days —
    * exactly Spark's encoding for these types. */
  def write(conf: Configuration, file: HPath, schema: StructType,
            rows: Seq[Row]): Unit = {
    val mt = messageType(schema)
    val hc = new Configuration(conf)
    GroupWriteSupport.setSchema(mt, hc)
    val w = ExampleParquetWriter.builder(file)
      .withConf(hc)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { r =>
      val g = new SimpleGroup(mt)
      var i = 0
      while (i < schema.length) {
        if (!r.isNullAt(i)) schema.fields(i).dataType match {
          case BooleanType => g.add(i, r.getBoolean(i))
          case IntegerType => g.add(i, r.getInt(i))
          case LongType => g.add(i, r.getLong(i))
          case FloatType => g.add(i, r.getFloat(i))
          case DoubleType => g.add(i, r.getDouble(i))
          case StringType => g.add(i, r.getString(i))
          case TimestampType =>
            val ts = r.getAs[java.sql.Timestamp](i)
            g.add(i, ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
          case DateType =>
            g.add(i, r.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
          case other =>
            throw new IllegalArgumentException(s"unsupported type $other")
        }
        i += 1
      }
      w.write(g)
    } finally w.close()
  }
}
