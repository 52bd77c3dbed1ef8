package graft.schema

import org.apache.spark.sql.types._

/** Wire-format schema of the reference's Kafka transaction message.
  *
  * The authoritative generator is the reference producer
  * (`FD/producer.py:57-77`, label at `:83,90`); 20 fields, JSON-encoded,
  * one message per transaction. See FIXTURES.md §1.
  */
case class Transaction(
    Time: Long,
    Customer_ID: String,
    Bank_Branch: String,
    Account_Type: String,
    Transaction_ID: String,
    Transaction_Date: String,
    Transaction_Time: String,
    Transaction_Amount: Double,
    Merchant_ID: String,
    Transaction_Type: String,
    Merchant_Category: String,
    Account_Balance: Double,
    Transaction_Device: String,
    Transaction_Location: String,
    Device_Type: String,
    Transaction_Currency: String,
    Customer_Contact: String,
    Transaction_Description: String,
    Customer_Email: String,
    Is_Fraud: Int
)

object Transactions {

  /** Explicit StructType for `from_json` ingest. Absent keys become nulls,
    * reproducing the reference's `dict.get(key, default)` access
    * (`FD/consumer.py:37-38,82-92`) once `na.fill` is applied.
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("Time", LongType),
    StructField("Customer_ID", StringType),
    StructField("Bank_Branch", StringType),
    StructField("Account_Type", StringType),
    StructField("Transaction_ID", StringType),
    StructField("Transaction_Date", StringType),
    StructField("Transaction_Time", StringType),
    StructField("Transaction_Amount", DoubleType),
    StructField("Merchant_ID", StringType),
    StructField("Transaction_Type", StringType),
    StructField("Merchant_Category", StringType),
    StructField("Account_Balance", DoubleType),
    StructField("Transaction_Device", StringType),
    StructField("Transaction_Location", StringType),
    StructField("Device_Type", StringType),
    StructField("Transaction_Currency", StringType),
    StructField("Customer_Contact", StringType),
    StructField("Transaction_Description", StringType),
    StructField("Customer_Email", StringType),
    StructField("Is_Fraud", IntegerType)
  ))

  /** The model's hard feature contract: 15 columns in fixed order
    * (`FD/features.py:2-18`). Order is load-bearing — the reference scaler
    * and classifiers are positional.
    */
  val featureOrder: Seq[String] = Seq(
    "Bank_Branch", "Account_Type", "Transaction_Amount", "Transaction_Type",
    "Merchant_Category", "Account_Balance", "Transaction_Location",
    "Device_Type", "Transaction_Currency",
    "year", "month", "day", "hour", "minute", "second"
  )

  /** Categoricals label-encoded at train time (`FD/features.py:20-28`). */
  val categoricalFeatures: Seq[String] = Seq(
    "Bank_Branch", "Account_Type", "Transaction_Type", "Merchant_Category",
    "Transaction_Location", "Device_Type", "Transaction_Currency"
  )

  /** ID/PII columns dropped before training (`FD/model.py:35-38`). */
  val droppedColumns: Seq[String] = Seq(
    "Customer_ID", "Merchant_ID", "Transaction_ID", "Customer_Contact",
    "Transaction_Description", "Customer_Email", "Transaction_Device"
  )
}
