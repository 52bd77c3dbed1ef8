package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's log-file "database": formatted block sink + block
  * parser — SURVEY §2.1 S6/S7 and §2.3 F10-F16.
  *
  * Block grammar (FIXTURES.md §3; writer `FD/consumer.py:134-150`, readers
  * `FD/dashboard.py:15-25` and `FD/evaluation.py:60-89`): a 68×`=`
  * delimiter, a header line, a `-` rule, then `Key: Value` lines. The
  * whole grammar is column expressions — formatting via `format_string`,
  * parsing via higher-order array functions into a map. No UDFs, so the
  * hot path stays inside codegen except the HOF map build.
  */
object LogGrammar {

  val delimiter: String = "=" * 68
  private val rule: String = "-" * 68

  /** S6: render one consumer-style log block per record. Column args are
    * the already-formatted display fields.
    */
  def formatBlock(txnId: Column, custId: Column, amount: Column, typ: Column,
                  merchant: Column, location: Column, device: Column,
                  date: Column, time: Column, prediction: Column,
                  actual: Column, probability: Column): Column =
    concat_ws("\n",
      lit(""), lit(delimiter), lit("New Transaction Received:"), lit(rule),
      concat(lit("Transaction ID: "), txnId),
      concat(lit("Customer ID: "), custId),
      concat(lit("Amount: "), format_string("$%.2f", amount)),
      concat(lit("Type: "), typ),
      concat(lit("Merchant: "), merchant),
      concat(lit("Location: "), location),
      concat(lit("Device: "), device),
      concat(lit("Date: "), date),
      concat(lit("Time: "), time),
      concat(lit("Fraud Prediction: "),
        when(prediction === 1, "FRAUD").otherwise("VALID")),
      concat(lit("Actual Fraud Status: "),
        when(actual === 1, "FRAUD").otherwise("VALID")),
      concat(lit("Fraud Probability: "), format_string("%.4f", probability)),
      lit(delimiter))

  /** S6 producer variant (`FD/producer.py:96-111`): header
    * `New Transaction Sent:`, ground-truth `Fraud Status:` field, no
    * prediction/probability lines.
    */
  def formatProducerBlock(txnId: Column, custId: Column, amount: Column,
                          typ: Column, merchant: Column, location: Column,
                          device: Column, date: Column, time: Column,
                          isFraud: Column): Column =
    concat_ws("\n",
      lit(""), lit(delimiter), lit("New Transaction Sent:"), lit(rule),
      concat(lit("Transaction ID: "), txnId),
      concat(lit("Customer ID: "), custId),
      concat(lit("Amount: "), format_string("$%.2f", amount)),
      concat(lit("Type: "), typ),
      concat(lit("Merchant: "), merchant),
      concat(lit("Location: "), location),
      concat(lit("Device: "), device),
      concat(lit("Date: "), date),
      concat(lit("Time: "), time),
      concat(lit("Fraud Status: "),
        when(isFraud === 1, "FRAUD").otherwise("VALID")),
      lit(delimiter))

  /** S7: split a whole log text into blocks (the dashboard's read path —
    * split on runs of 60+ `=`).
    */
  def splitBlocks(wholeText: Column): Column =
    split(wholeText, "={60,}")

  /** F13+F14: parse a block's `Key: Value` lines into a map with
    * normalized keys (`strip().lower().replace(' ','_')` —
    * `FD/evaluation.py:65-70`: ANY line containing ':' splits on the
    * first one, so header lines yield an empty-valued key, exactly like
    * the reference). Split-limit-2 semantics: the value keeps any
    * further colons. Single native pass
    * (`graft.functions.ParseLogBlock`); `parseBlockComposable` is the
    * equivalent built-in spelling, kept as the semantic reference.
    */
  def parseBlock(block: Column): Column =
    graft.functions.ParseLogBlock.parse(block)

  def parseBlockComposable(block: Column): Column =
    map_from_entries(
      transform(
        filter(split(block, "\n"), l => l.contains(":")),
        l => struct(
          regexp_replace(lower(trim(substring_index(l, ":", 1))), " ", "_")
            .as("key"),
          trim(l.substr(instr(l, ":") + 1, length(l))).as("value"))))

  /** Typed projections out of a parsed block map — the evaluation.py
    * read-side contract (`FD/evaluation.py:71-89`).
    */
  def amountOf(m: Column): Column =
    coalesce(regexp_replace(m.getItem("amount"), "[$\\s]", "").cast("double"),
      lit(0.0))
  def probabilityOf(m: Column): Column =
    coalesce(m.getItem("fraud_probability").cast("double"), lit(0.0))
  def predictedOf(m: Column): Column =
    when(upper(m.getItem("fraud_prediction")) === "FRAUD", 1).otherwise(0)
  def actualOf(m: Column): Column =
    when(upper(m.getItem("actual_fraud_status")) === "FRAUD", 1).otherwise(0)
}
