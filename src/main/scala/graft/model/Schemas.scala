package graft.model

import java.sql.Date

import org.apache.spark.sql.types._

/** The reference's data model (`scripts/postgresql_setup.sql:9-42`),
  * canonicalized to lowercase column names (SURVEY.md §1.2).
  *
  * Types follow the reference exactly: `transaction_time` is a string,
  * not a TIME type (`postgresql_setup.sql:37`), and money stays
  * `DoubleType` (`postgresql_setup.sql:28,39`) — do not "fix" either.
  */
object Schemas {

  case class Customer(customer_id: Int, firstname: String, lastname: String,
                      age: Int, email: String, phone_number: String)

  case class Merchant(merchant_id: Int, merchant_name: String,
                      merchant_category: String)

  case class Product(product_id: Int, product_name: String,
                     product_category: String, price: Double)

  case class Transaction(transaction_id: String, customer_id: Int,
                         product_id: Int, merchant_id: Int,
                         transaction_date: Date, transaction_time: String,
                         quantity: Int, total_price: Double,
                         transaction_card: String, transaction_category: String)

  /** One row of the flagship view (`0_start_here.ipynb:220-235`). */
  case class PurchaseSummary(transaction_id: String, customer_id: Int,
                             customer_age: Int, product_id: Int,
                             product_name: String, product_category: String,
                             merchant_id: Int, merchant_name: String,
                             merchant_category: String, transaction_date: Date,
                             transaction_time: String, quantity: Int,
                             total_price: Double, transaction_card: String,
                             transaction_category: String)

  val customers: StructType = StructType(Seq(
    StructField("customer_id", IntegerType, nullable = false),
    StructField("firstname", StringType),
    StructField("lastname", StringType),
    StructField("age", IntegerType),
    StructField("email", StringType),
    StructField("phone_number", StringType)))

  val merchants: StructType = StructType(Seq(
    StructField("merchant_id", IntegerType, nullable = false),
    StructField("merchant_name", StringType),
    StructField("merchant_category", StringType)))

  val products: StructType = StructType(Seq(
    StructField("product_id", IntegerType, nullable = false),
    StructField("product_name", StringType),
    StructField("product_category", StringType),
    StructField("price", DoubleType)))

  val transactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("customer_id", IntegerType),
    StructField("product_id", IntegerType),
    StructField("merchant_id", IntegerType),
    StructField("transaction_date", DateType),
    StructField("transaction_time", StringType),
    StructField("quantity", IntegerType),
    StructField("total_price", DoubleType),
    StructField("transaction_card", StringType),
    StructField("transaction_category", StringType)))

  /** Primary keys (`postgresql_setup.sql:10,19,25,32`) — the CDC merge
    * keys for replicated-table maintenance. */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "customers" -> Seq("customer_id"),
    "merchants" -> Seq("merchant_id"),
    "products" -> Seq("product_id"),
    "transactions" -> Seq("transaction_id"))

  val tableSchemas: Map[String, StructType] = Map(
    "customers" -> customers,
    "merchants" -> merchants,
    "products" -> products,
    "transactions" -> transactions)
}
