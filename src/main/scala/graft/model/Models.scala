package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Case-class mirrors of the reference POCOs (SURVEY §1.2).
  * Field names match the reference JSON shapes so `spark.read.json` on
  * Cosmic-Works-style payloads binds directly.
  */
case class Tag(id: String, name: String) // Product.cs:51-61

case class Product( // Product.cs:8-35
    id: String, categoryId: String, categoryName: String, sku: String,
    name: String, description: String, price: Double,
    tags: Seq[Tag] = Seq.empty, vector: Option[Seq[Float]] = None)

case class Location(`type`: String, coordinates: Seq[Float]) // Customer.cs:79-89

case class CustomerAddress( // Customer.cs:57-77
    addressLine1: String, addressLine2: String, city: String, state: String,
    country: String, zipCode: String, location: Location)

case class Password(hash: String, salt: String) // Customer.cs:45-55

case class Customer( // Customer.cs:6-43
    id: String, `type`: String, customerId: String, title: String,
    firstName: String, lastName: String, emailAddress: String,
    phoneNumber: String, creationDate: String, // string in the reference
    addresses: Seq[CustomerAddress] = Seq.empty, password: Option[Password] = None,
    salesOrderCount: Int = 0, vector: Option[Seq[Float]] = None)

case class SalesOrderDetail(sku: String, name: String, price: Double, quantity: Int)

case class SalesOrder( // SalesOrder.cs:6-44
    id: String, `type`: String, customerId: String,
    orderDate: String, shipDate: String,
    details: Seq[SalesOrderDetail] = Seq.empty, vector: Option[Seq[Float]] = None)

/** Polymorphic `completions` row: Session AND Message share one table,
  * discriminated by Type (MongoDbService.cs:62-63) — the superset schema
  * keeps TX1 (session + messages in one commit) single-table. */
case class CompletionRow(
    Id: String, Type: String, SessionId: String,
    TokensUsed: Option[Int] = None, // Session: running total (A1)
    Name: Option[String] = None, // Session: display name
    TimeStamp: Option[Timestamp] = None, // Message
    Sender: Option[String] = None, // Message: User | Assistant
    Tokens: Option[Int] = None, // Message: own token count
    PromptTokens: Option[Int] = None, // Message: assembled-prompt tokens
    Text: Option[String] = None) // Message

object CompletionRow {
  val TypeSession = "Session"
  val TypeMessage = "Message"
  val SenderUser = "User" // Participants.cs:3-7
  val SenderAssistant = "Assistant"

  def session(sessionId: String, name: String = "New Chat", tokensUsed: Int = 0): CompletionRow =
    CompletionRow(Id = sessionId, Type = TypeSession, SessionId = sessionId,
      TokensUsed = Some(tokensUsed), Name = Some(name))

  def message(sessionId: String, sender: String, text: String, tokens: Int,
              promptTokens: Int, ts: Timestamp, id: String): CompletionRow =
    CompletionRow(Id = id, Type = TypeMessage, SessionId = sessionId,
      TimeStamp = Some(ts), Sender = Some(sender), Tokens = Some(tokens),
      PromptTokens = Some(promptTokens), Text = Some(text))
}

object Schemas {
  val tag: StructType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType)))

  val product: StructType = StructType(Seq(
    StructField("id", StringType), StructField("categoryId", StringType),
    StructField("categoryName", StringType), StructField("sku", StringType),
    StructField("name", StringType), StructField("description", StringType),
    StructField("price", DoubleType), StructField("tags", ArrayType(tag)),
    StructField("vector", ArrayType(FloatType))))
}
