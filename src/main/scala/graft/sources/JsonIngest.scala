package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON ingest sources (SURVEY §2.1 S1/S2).
  *
  * The reference downloads whole JSON-array blobs and deserializes them
  * schemalessly (Vectorize/IngestAndVectorize.cs:52-94 →
  * MongoDbService.cs:420). The engine reads the same shape with
  * `spark.read.json`: schema-on-read by default, or a supplied schema to
  * skip the inference pass (one extra file scan saved — at 100 TB supply
  * the schema).
  */
object JsonIngest {

  /** S1: a JSON **array** file ("[{...}, {...}]"), the blob layout the
    * reference ingests. multiLine is required — a JSON array is one
    * document, not line-delimited records. */
  def readJsonArray(spark: SparkSession, path: String,
                    schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", "true")
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** JSON-lines variant (the splittable layout a 100 TB corpus should
    * actually use — multiLine arrays force one task per file). */
  def readJsonLines(spark: SparkSession, path: String,
                    schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S2: deserialize a dataset of JSON strings (the
    * `BsonSerializer.Deserialize` analog, distributed). */
  def parseJsonStrings(spark: SparkSession, json: Dataset[String],
                       schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(json)
  }

  /** Schema-on-read projection of a JSON string column inside a table
    * (`from_json` — the events.props pattern). */
  def parseJsonColumn(df: DataFrame, jsonCol: String, schema: StructType,
                      outCol: String = "parsed"): DataFrame =
    df.withColumn(outCol, from_json(col(jsonCol), schema))
}
