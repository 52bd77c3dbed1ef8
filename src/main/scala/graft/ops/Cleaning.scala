package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / filter / cleaning operators — SURVEY §2.2 P1-P10.
  *
  * Pure `DataFrame => DataFrame` functions; each is independently
  * oracle-testable. Catalyst collapses drop+select into a pruned scan, so
  * the eager-pandas materialization of the reference costs nothing here.
  */
object Cleaning {

  /** P1: drop ID/PII columns, ignore-if-missing (`FD/model.py:35-38`).
    * Spark's `drop` is already a no-op on missing columns — same semantics
    * as pandas `errors='ignore'`.
    */
  def dropColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** P2: project an exact ordered column list (`FD/model.py:95`,
    * `FD/consumer.py:73`). Order is the feature contract.
    */
  def selectOrdered(df: DataFrame, order: Seq[String]): DataFrame =
    df.select(order.map(col): _*)

  /** P3: inject any absent column as constant 0 (`FD/model.py:70-72`). */
  def injectMissing(df: DataFrame, required: Seq[String]): DataFrame =
    required.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(0))
    }

  /** P4: full-row deduplication (`FD/model.py:48`). At scale this is a
    * hash-shuffle on all columns; prefer `dedupBy` with an explicit key
    * when one exists.
    */
  def dropDuplicates(df: DataFrame): DataFrame = df.dropDuplicates()

  /** P5: pandas `df.fillna(0)` (`FD/model.py:49`) — numeric nulls → 0.
    * Pandas' untyped fill also hits object columns; `fillString` mirrors
    * that when string parity is required.
    */
  def fillNumericNulls(df: DataFrame): DataFrame = df.na.fill(0)
  def fillStringNulls(df: DataFrame, v: String = "0"): DataFrame = df.na.fill(v)

  /** P6: drop rows with nulls in a subset (`FD/evaluation.py:125,129`). */
  def dropNulls(df: DataFrame, subset: Seq[String]): DataFrame =
    df.na.drop(subset)

  /** P7: fraud-row predicate filter (`FD/evaluation.py:168`). */
  def filterFraud(df: DataFrame, labelCol: String = "actual_fraud"): DataFrame =
    df.filter(col(labelCol) === 1)

  /** P8: keep non-blank blocks containing "Transaction ID"
    * (`FD/dashboard.py:20-23`, `FD/evaluation.py:107-111`).
    */
  def validBlocks(df: DataFrame, blockCol: String = "block"): DataFrame =
    df.filter(length(trim(col(blockCol))) > 0 &&
      col(blockCol).contains("Transaction ID"))

  /** P9: class-presence guard (`FD/model.py:99-100`) — returns per-class
    * counts; caller asserts both classes present.
    */
  def classCounts(df: DataFrame, labelCol: String): DataFrame =
    df.groupBy(labelCol).count()

  /** P10: names of required columns missing from the frame
    * (`FD/evaluation.py:119-122`).
    */
  def missingColumns(df: DataFrame, required: Seq[String]): Seq[String] =
    required.filterNot(df.columns.contains)

  /** Luhn checksum validity of a digit-string column — the mod-10
    * check every card-number field passes before a fraud pipeline
    * trusts it (ISO/IEC 7812; a single mistyped digit or adjacent
    * transposition fails it). Pure integer column arithmetic —
    * walking from the RIGHT, every second digit doubles (minus 9 when
    * > 9) and the total must divide by 10 — as one scan-local
    * `aggregate` HOF: no UDF, engine-exact, and the f21 oracle
    * restates the identical fold in DuckDB.
    */
  def luhnValid(digitsCol: String): Column = luhnValid(col(digitsCol))

  /** Column-typed form — the identifier never round-trips through SQL
    * parsing, so qualified/special-character names (and any injection
    * via a crafted name) are structurally impossible, and the digit is
    * extracted ONCE per position (the old SQL-string fold re-ran the
    * substr/CAST per branch of the doubled case).
    */
  def luhnValid(digits: Column): Column = {
    val total = aggregate(
      sequence(lit(1), length(digits)),
      lit(0),
      (acc, i) => {
        val d = digits.substr(i, lit(1)).cast("int")
        val doubled = d * 2
        acc + when((length(digits) - i) % 2 === 1,
          when(doubled > 9, doubled - 9).otherwise(doubled))
          .otherwise(d)
      })
    total % 10 === 0
  }
}
