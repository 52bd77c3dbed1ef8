package graft.streaming

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.Transformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

import graft.ml.TrainingJob
import graft.ops.LogGrammar

/** Streaming inference topology — SURVEY §3.2 (`FD/consumer.py:96-161`)
  * in Spark shape:
  *
  *   source → decode → feature exprs → PipelineModel.transform
  *     → (a) formatted-block/structured sink (S6, via foreachBatch)
  *     → (b) running counters (A1, update mode)
  *
  * The reference scores one row at a time (a 1×15 pandas frame per Kafka
  * message — maximally anti-vectorized). Micro-batching restores real
  * vectorization: the same `PipelineModel.transform` used in training
  * scores whole batches through codegen'd expressions, and the model
  * broadcasts to executors via the plan closure. State lives in the
  * state store, not process globals.
  */
object Scorer {

  /** Score a (streaming or batch) frame of wire-format transactions. */
  def score(parsed: DataFrame, features: PipelineModel,
            model: Transformer): DataFrame =
    TrainingJob.score(parsed, features, model)

  /** A1: the two running counters as a streaming aggregation. Complete
    * mode keeps the all-time totals queryable — the `counts.log`
    * semantics (`FD/consumer.py:127-131`, SURVEY §drift-2).
    */
  def counters(scoredDf: DataFrame): DataFrame =
    graft.ops.Aggregates.classCounters(scoredDf, "prediction_label")

  /** Render scored rows as consumer-log blocks (S6 display parity). */
  def blocks(scoredDf: DataFrame): DataFrame =
    scoredDf.select(LogGrammar.formatBlock(
      txnId = col("Transaction_ID"),
      custId = col("Customer_ID"),
      amount = col("Transaction_Amount"),
      typ = col("Transaction_Type"),
      merchant = col("Merchant_ID"),
      location = col("Transaction_Location"),
      device = col("Device_Type"),
      date = col("Transaction_Date"),
      time = col("Transaction_Time"),
      prediction = col("prediction").cast("int"),
      actual = col("Is_Fraud"),
      probability = col("fraud_probability")).as("block"))

  /** One micro-batch of the structured sink, keyed by batch id: each
    * batch OVERWRITES its own `batch_id=<n>` partition directory, so a
    * batch retried after a mid-write failure replaces its partial output
    * instead of re-appending — idempotent, which is what upgrades the
    * checkpoint's at-least-once replay to an exactly-once effect.
    * Public so non-streaming callers/tests can drive it directly.
    */
  def writeSinkBatch(batch: DataFrame, batchId: Long, parquetPath: String,
                     textLogPath: Option[String],
                     dropCols: Seq[String]): Unit = {
    val cols = batch.columns.filterNot(dropCols.contains)
    val slim = batch.select(cols.map(col).toIndexedSeq: _*)
    slim.persist()
    slim.write.mode("overwrite").parquet(s"$parquetPath/batch_id=$batchId")
    textLogPath.foreach { p =>
      blocks(slim).coalesce(1).write.mode("overwrite")
        .text(s"$p/batch_id=$batchId")
    }
    slim.unpersist()
    ()
  }

  /** Structured sink: scored stream → parquet (the queryable replacement
    * for the log-file IPC bus, §3.3). Batch-id-keyed overwrite makes the
    * replay idempotent ([[writeSinkBatch]]); readers see `batch_id` as a
    * discovered partition column.
    */
  def sinkWriter(scoredDf: DataFrame, parquetPath: String,
                 checkpoint: String, textLogPath: Option[String] = None)
      : DataStreamWriter[Row] = {
    val dropCols = Seq("features", "features_raw", "rawPrediction",
      "probability")
    scoredDf.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("2 seconds")) // producer cadence (S4)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeSinkBatch(batch, batchId, parquetPath, textLogPath, dropCols)
      }
  }

  /** Counter sink: update-mode counts appended as `counts.log`-format
    * lines (S11) — `Fraud Count: N` / `Non-Fraud Count: N` snapshots,
    * latest-wins on read (A7). At-least-once is sufficient here: a
    * replayed batch re-appends an identical snapshot line, and the
    * read side ([[lastCounts]]) takes the max of the monotonically
    * nondecreasing counters, so duplicates are absorbed.
    */
  def counterWriter(countersDf: DataFrame, textPath: String,
                    checkpoint: String): DataStreamWriter[Row] =
    countersDf.writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select(
          concat(
            when(col("prediction_label") === "FRAUD", "Fraud Count: ")
              .otherwise("Non-Fraud Count: "),
            col("cnt")).as("line"))
          .coalesce(1).write.mode("append").text(textPath)
        ()
      }

  /** One micro-batch of the relational sink: delete any rows a previous
    * (failed, replayed) attempt of this batch id wrote, then append the
    * batch rows tagged with `batch_id` — idempotent on retry without
    * requiring target-side upsert support. The delete is a no-op on the
    * happy path and tolerates a not-yet-created table (probed with a
    * zero-row select, the only condition that is safe to swallow); any
    * failure of the delete itself PROPAGATES — a silently-skipped delete
    * would downgrade replay to duplicate-appending at-least-once while
    * still claiming exactly-once.
    */
  def writeJdbcBatch(batch: DataFrame, batchId: Long, url: String,
                     table: String, props: java.util.Properties,
                     dropCols: Seq[String] = Seq("features", "features_raw",
                       "rawPrediction", "probability")): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      // quote through the url's dialect, matching how Spark's JDBC
      // writer created the column ("batch_id" on Derby/Postgres,
      // `batch_id` on MySQL — an ANSI-quoted literal there would make
      // the predicate constant-true/false instead of a column match)
      val quoted = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
        .quoteIdentifier("batch_id")
      // Only the SQLStates that specifically mean "table does not
      // exist" (Derby 42X05, Postgres 42P01, MySQL/H2 42S02, H2 legacy
      // 42102) — or a driver that reports no SQLState at all (SQLite) —
      // count as first-batch. Everything else, including the
      // same-class-42 privilege violations (42501/42000/42502),
      // PROPAGATES: a swallowed probe failure would skip the delete and
      // silently re-duplicate on replay.
      val tableMissingStates = Set("42X05", "42P01", "42S02", "42102")
      val exists =
        try {
          val st = conn.createStatement()
          try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1 = 0"); true }
          finally st.close()
        } catch {
          case e: java.sql.SQLException
              if e.getSQLState == null ||
                tableMissingStates.contains(e.getSQLState) => false
        }
      if (exists) {
        val st = conn.createStatement()
        try st.executeUpdate(
          s"DELETE FROM $table WHERE $quoted = $batchId")
        finally st.close()
      }
    } finally conn.close()
    val cols = batch.columns.filterNot(dropCols.contains)
    batch.select(cols.map(col).toIndexedSeq: _*)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").jdbc(url, table, props)
    ()
  }

  /** S10: relational sink (the reference declares a psycopg2 factory it
    * never calls, `FD/consumer.py:28-35`; here it is a working
    * foreachBatch JDBC sink with delete-then-append idempotence per
    * batch id — [[writeJdbcBatch]] — so checkpoint replay is
    * exactly-once in effect).
    */
  def jdbcWriter(scoredDf: DataFrame, url: String, table: String,
                 checkpoint: String,
                 props: java.util.Properties = new java.util.Properties)
      : DataStreamWriter[Row] =
    scoredDf.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeJdbcBatch(batch, batchId, url, table, props)
      }

  /** Streaming exact dedup: drop re-deliveries of the same transaction
    * across micro-batches (at-least-once Kafka → exactly-once effect).
    * State is bounded by the watermark: duplicates arriving later than
    * the delay are outside the guarantee, matching Spark's
    * dropDuplicatesWithinWatermark contract.
    */
  def dedupStream(parsed: DataFrame, eventTimeCol: String,
                  idCols: Seq[String], watermarkDelay: String): DataFrame =
    parsed
      .withColumn("__event_time",
        org.apache.spark.sql.functions.timestamp_seconds(col(eventTimeCol)))
      .withWatermark("__event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
      .drop("__event_time")

  /** S11 read-back: latest counter value per key from a counts.log-format
    * text dir. The counters are all-time (monotonically nondecreasing),
    * so latest == max — no ordering column needed across append files.
    */
  def lastCounts(spark: org.apache.spark.sql.SparkSession,
                 textPath: String): DataFrame = {
    val lines = spark.read.text(textPath)
    lines
      .select(
        trim(substring_index(col("value"), ":", 1)).as("key"),
        // try_cast: a torn/partial line (writer killed mid-append — the
        // failure mode this sink tolerates by design) must skip, not
        // raise ANSI CAST_INVALID_INPUT
        expr("try_cast(trim(substring(value, instr(value, ':') + 1)) AS BIGINT)")
          .as("cnt"))
      .filter(col("cnt").isNotNull)
      .groupBy(col("key")).agg(max(col("cnt")).as("last_value"))
  }
}
