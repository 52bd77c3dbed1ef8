package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date/time scalar operators — SURVEY §2.3 F1-F6.
  *
  * All column expressions (whole-stage-codegen friendly, no UDFs). The
  * session timezone is pinned UTC; the reference used `time.localtime`
  * (machine-local, `FD/producer.py:24`) which we deliberately pin for
  * determinism (SURVEY §2.9.5).
  */
object TimeFeatures {

  /** F1+F2: `Transaction_Date + ' ' + Transaction_Time` → timestamp
    * (`FD/model.py:42`).
    */
  def combinedTimestamp(date: Column, time: Column): Column =
    // concat (not concat_ws) so a null date/time yields null instead of
    // a partial string, and try_to_timestamp so malformed input yields
    // null instead of an ANSI CANNOT_PARSE_TIMESTAMP that kills the job
    // (Spark 4 defaults ANSI on) — one bad wire row must not take down
    // a streaming scorer
    try_to_timestamp(concat(date, lit(" "), time),
      lit("yyyy-MM-dd HH:mm:ss"))

  /** F3: epoch seconds → timestamp (`FD/producer.py:24`, `FD/consumer.py:42`). */
  def epochToTimestamp(epochSeconds: Column): Column =
    timestamp_seconds(epochSeconds)

  /** F4: six integer datetime components (`FD/model.py:53-58`,
    * `FD/producer.py:37-42`). Appends year/month/day/hour/minute/second.
    */
  def withTimeComponents(df: DataFrame, ts: Column): DataFrame =
    df.withColumn("year", year(ts))
      .withColumn("month", month(ts))
      .withColumn("day", dayofmonth(ts))
      .withColumn("hour", hour(ts))
      .withColumn("minute", minute(ts))
      .withColumn("second", second(ts))

  /** F5: format date / time strings (`FD/producer.py:63-64`). */
  def formatDate(ts: Column): Column = date_format(ts, "yyyy-MM-dd")
  def formatTime(ts: Column): Column = date_format(ts, "HH:mm:ss")

  /** F6: round to 2 decimal places (`FD/producer.py:65,69,82,89`). */
  def round2(c: Column): Column = round(c, 2)
}
