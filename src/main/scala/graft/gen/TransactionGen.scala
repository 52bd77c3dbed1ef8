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
  private def pick(values: Seq[String], u: Column): Column =
    element_at(
      array(values.map(lit): _*),
      (floor(u * values.size) + 1).cast("int"))

  private def randInt(lo: Int, hi: Int, u: Column): Column =
    (floor(u * (hi - lo + 1)) + lo).cast("long")

  /** A [0,1) uniform per (draw index, row id) that ANY engine with md5
    * can replay bit-for-bit: the first 8 md5-hex chars of
    * `"s03_<k>:<id>"` as a 32-bit integer over 2^32 (the Sampling
    * portable-mode recipe). ~20× slower per draw than `rand(seed)` —
    * the oracle-replayable twin, not the scale path.
    */
  private def portableUniform(k: Int): Column =
    conv(substring(md5(concat(lit(s"s03_$k:"), col("id").cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long") / lit(4294967296.0)

  /** Per-column generator expressions over existing `id` + `Time`
    * columns. `u(k)` supplies the k-th uniform draw — `rand(seed + k)`
    * in the fast JVM mode, [[portableUniform]] in the oracle-replayable
    * mode. `centsAmounts` switches the two amount bands from
    * `round(real, 2)` to an integer-cents closed form
    * (`lo + floor(u * span)` cents) so the portable mode has no
    * float-rounding divergence to replay.
    */
  private def fieldExprs(u: Int => Column,
                         centsAmounts: Boolean): Seq[(String, Column)] = {
    val isFraud = (col("id") % 2 === 0).cast("int")
    val fraudPattern = isFraud === 1 && u(13) > 0.7
    val ts = timestamp_seconds(col("Time"))
    val amount =
      if (centsAmounts)
        when(isFraud === 1,
          (lit(500000L) + floor(u(5) * 500000)).cast("double") / 100.0)
          .otherwise(
            (lit(1000L) + floor(u(5) * 299000)).cast("double") / 100.0)
      else round(
        when(isFraud === 1, u(5) * (10000 - 5000) + 5000)
          .otherwise(u(5) * (3000 - 10) + 10), 2)
    Seq(
      "Is_Fraud" -> isFraud,
      "Customer_ID" -> concat(lit("CUST"), randInt(10000, 99999, u(1))),
      "Bank_Branch" -> pick(branches, u(2)),
      "Account_Type" -> pick(accountTypes, u(3)),
      "Transaction_ID" -> concat(lit("TXN"), randInt(100000, 999999, u(4))),
      "Transaction_Date" -> date_format(ts, "yyyy-MM-dd"),
      "Transaction_Time" -> when(fraudPattern, lit("03:00:05"))
        .otherwise(date_format(ts, "HH:mm:ss")),
      "Transaction_Amount" -> amount,
      "Merchant_ID" -> concat(lit("MERC"), randInt(1000, 9999, u(6))),
      "Transaction_Type" -> pick(txnTypes, u(7)),
      "Merchant_Category" -> pick(merchCats, u(8)),
      "Account_Balance" -> round(u(9) * 100000, 2),
      "Transaction_Device" -> concat(lit("DEV"), randInt(100, 999, u(10))),
      "Transaction_Location" -> when(fraudPattern, lit("LOC99"))
        .otherwise(concat(lit("LOC"), randInt(1, 50, u(11)))),
      "Device_Type" -> pick(deviceTypes, u(12)),
      "Transaction_Currency" -> pick(currencies, u(14)),
      "Customer_Contact" -> concat(lit("+1"), randInt(200, 999, u(15)),
        randInt(1000000, 9999999, u(16))),
      "Transaction_Description" -> pick(descriptions, u(17)),
      "Customer_Email" -> concat(lit("user"), randInt(1000, 9999, u(18)),
        lit("@example.com")))
  }

  private def applyFields(df: DataFrame, seed: Long): DataFrame =
    fieldExprs(k => rand(seed + k), centsAmounts = false)
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

  /** The oracle-replayable twin of [[batch]]: every uniform draw is
    * [[portableUniform]] (md5 of `"s03_<k>:<id>"`) and the amount bands
    * are integer cents, so any engine with md5 — DuckDB included — can
    * rebuild every generated row from the id alone. Same alternation
    * (id parity), same 30% injection (`u(13) > 0.7` on fraud rows →
    * LOC99 + 03:00:05), same domains; still a single distributed
    * projection over `spark.range`, no shared state.
    */
  def batchPortable(spark: SparkSession, n: Long,
                    baseEpoch: Long = 1735689600L,
                    partitions: Int = 0): DataFrame = {
    val range =
      if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    fieldExprs(portableUniform, centsAmounts = true)
      .foldLeft(
        range.withColumn("Time", lit(baseEpoch) + col("id") * 2)) {
        case (d, (name, c)) => d.withColumn(name, c)
      }
      .select(Transactions.wireSchema.fieldNames.map(col).toIndexedSeq: _*)
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
