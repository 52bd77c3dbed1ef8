package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Transactions

/** Deterministic synthetic transaction generator — SURVEY §2.1 S3/S4,
  * §2.3 F7/F8/F17 (reference generator `FD/producer.py:52-124`).
  *
  * Spark-first shape: an `id` column drives everything — each field is a
  * `rand(seed)`-derived column expression, so generation distributes
  * across executors, scales linearly, and is reproducible for a given
  * seed. The reference's strict fraud/valid alternation (a process-global
  * toggle, `FD/producer.py:81`) becomes id-parity, which reproduces the
  * alternation without shared state. Batch and streaming share the same
  * expression set; the stream keys it off the rate source.
  *
  * Domains per FIXTURES.md §1: 30% of fraud rows get the suspicious
  * location LOC99 + time 03:00:05 (`FD/producer.py:85-87`); fraud amounts
  * U(5000,10000), valid U(10,3000) (`FD/producer.py:82,89`).
  */
object TransactionGen {

  private val branches = Seq("Los Angeles", "San Francisco", "New York",
    "Chicago", "Miami")
  private val accountTypes = Seq("Savings", "Business", "Checking")
  private val txnTypes = Seq("POS", "Bank Transfer", "ATM Withdrawal", "Online")
  private val merchCats = Seq("Electronics", "Dining", "Grocery", "Clothing",
    "Services")
  private val deviceTypes = Seq("Mobile", "Desktop", "ATM", "POS Terminal")
  private val currencies = Seq("USD", "EUR", "GBP")
  private val descriptions = Seq("Purchase", "Withdrawal", "Transfer", "Payment")

  /** Uniform pick from a small domain, seeded per-column
    * (`random.choice`, `FD/producer.py:60-76`).
    */
  private def pick(values: Seq[String], seed: Long): Column =
    element_at(
      array(values.map(lit): _*),
      (floor(rand(seed) * values.size) + 1).cast("int"))

  private def randInt(lo: Int, hi: Int, seed: Long): Column =
    (floor(rand(seed) * (hi - lo + 1)) + lo).cast("long")

  private def randUniform(lo: Double, hi: Double, seed: Long): Column =
    rand(seed) * (hi - lo) + lo

  /** Per-column generator expressions over existing `id` + `Time` columns. */
  private def fieldExprs(seed: Long): Seq[(String, Column)] = {
    val isFraud = (col("id") % 2 === 0).cast("int")
    val fraudPattern = isFraud === 1 && rand(seed + 13) > 0.7
    val ts = timestamp_seconds(col("Time"))
    Seq(
      "Is_Fraud" -> isFraud,
      "Customer_ID" -> concat(lit("CUST"), randInt(10000, 99999, seed + 1)),
      "Bank_Branch" -> pick(branches, seed + 2),
      "Account_Type" -> pick(accountTypes, seed + 3),
      "Transaction_ID" -> concat(lit("TXN"), randInt(100000, 999999, seed + 4)),
      "Transaction_Date" -> date_format(ts, "yyyy-MM-dd"),
      "Transaction_Time" -> when(fraudPattern, lit("03:00:05"))
        .otherwise(date_format(ts, "HH:mm:ss")),
      "Transaction_Amount" -> round(
        when(isFraud === 1, randUniform(5000, 10000, seed + 5))
          .otherwise(randUniform(10, 3000, seed + 5)), 2),
      "Merchant_ID" -> concat(lit("MERC"), randInt(1000, 9999, seed + 6)),
      "Transaction_Type" -> pick(txnTypes, seed + 7),
      "Merchant_Category" -> pick(merchCats, seed + 8),
      "Account_Balance" -> round(randUniform(0, 100000, seed + 9), 2),
      "Transaction_Device" -> concat(lit("DEV"), randInt(100, 999, seed + 10)),
      "Transaction_Location" -> when(fraudPattern, lit("LOC99"))
        .otherwise(concat(lit("LOC"), randInt(1, 50, seed + 11))),
      "Device_Type" -> pick(deviceTypes, seed + 12),
      "Transaction_Currency" -> pick(currencies, seed + 14),
      "Customer_Contact" -> concat(lit("+1"), randInt(200, 999, seed + 15),
        randInt(1000000, 9999999, seed + 16)),
      "Transaction_Description" -> pick(descriptions, seed + 17),
      "Customer_Email" -> concat(lit("user"), randInt(1000, 9999, seed + 18),
        lit("@example.com")))
  }

  private def applyFields(df: DataFrame, seed: Long): DataFrame =
    fieldExprs(seed)
      .foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
      .select(Transactions.wireSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** Batch generation of `n` transactions. `baseEpoch` anchors the
    * 2-seconds-per-message cadence (S4, `FD/producer.py:134`).
    */
  def batch(spark: SparkSession, n: Long, seed: Long = 42L,
            baseEpoch: Long = 1735689600L, partitions: Int = 0): DataFrame = {
    val range =
      if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    applyFields(
      range.withColumn("Time", lit(baseEpoch) + col("id") * 2), seed)
  }

  /** Streaming variant over the rate source. rowsPerSecond=1 with a
    * 2-second trigger approximates the producer cadence; higher rates are
    * the scale path.
    */
  def stream(spark: SparkSession, rowsPerSecond: Int = 1,
             seed: Long = 42L): DataFrame = {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    applyFields(
      rate.select(col("value").as("id"),
        unix_timestamp(col("timestamp")).as("Time")), seed)
  }
}
