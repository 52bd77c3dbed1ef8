package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Transactions

/** Wire codec + stream endpoints — SURVEY §2.1 S1/S2, §2.6.
  *
  * The reference moves JSON dicts through Kafka topic `fraud_topic`
  * (`FD/producer.py:14-17,133`; `FD/consumer.py:104-109`). Here the codec
  * is `to_json(struct(*))` / `from_json(value, schema)` — schema-checked,
  * codegen'd, and identical for batch and streaming frames. Kafka
  * endpoints are expressed through the standard `format("kafka")` DSV2
  * source/sink (requires the spark-sql-kafka connector on the deploy
  * classpath — not bundled in this offline build, so tests drive the
  * same codec through MemoryStream/file sources; checkpointing replaces
  * consumer-group offsets for at-least-once → exactly-once-to-sink).
  */
object WireFormat {

  val defaultTopic = "fraud_topic"

  /** S1 payload: one JSON document per transaction row. */
  def encode(allCols: Column): Column = to_json(allCols)

  def encodeFrame(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))

  /** S2 payload: JSON string → 20 typed fields. Absent keys → null
    * (`dict.get` semantics); corrupt JSON → all-null row, filtered by the
    * caller (catch-log-continue, `FD/consumer.py:158-159`).
    */
  def decodeFrame(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(from_json(col(valueCol).cast("string"),
        Transactions.wireSchema).as("t"))
      .select(col("t.*"))

  /** Rows whose payload failed to decode entirely (dead-letter side). */
  def corrupt(df: DataFrame): DataFrame =
    df.filter(Transactions.wireSchema.fieldNames
      .map(col(_).isNull).reduce(_ && _))

  /** The complement: decodable rows — the scoring path's input. The
    * catch-log-continue contract (`FD/consumer.py:158-159`) means a
    * corrupt message must be dropped (or dead-lettered), never scored.
    */
  def valid(df: DataFrame): DataFrame =
    df.filter(Transactions.wireSchema.fieldNames
      .map(col(_).isNotNull).reduce(_ || _))

  /** The exact DSV2 options the Kafka source receives — the reference's
    * transport config (`FD/consumer.py:104-109`: bootstrap servers,
    * subscribed topic, latest offsets) in connector form. Exposed
    * separately so the contract is testable without the connector jar.
    */
  def kafkaSourceOptions(bootstrap: String,
                         topic: String = defaultTopic): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> "latest")

  /** Sink-side DSV2 options (`FD/producer.py:14-17,133`). */
  def kafkaSinkOptions(bootstrap: String, topic: String,
                       checkpoint: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "topic" -> topic,
      "checkpointLocation" -> checkpoint)

  /** Kafka source (deploy classpath provides the connector). */
  def fromKafka(spark: SparkSession, bootstrap: String,
                topic: String = defaultTopic): DataFrame =
    decodeFrame(
      spark.readStream.format("kafka")
        .options(kafkaSourceOptions(bootstrap, topic))
        .load())

  /** Kafka sink writer (S1): call `.start()` on the returned writer. */
  def toKafka(df: DataFrame, bootstrap: String, topic: String,
              checkpoint: String) =
    encodeFrame(df).writeStream.format("kafka")
      .options(kafkaSinkOptions(bootstrap, topic, checkpoint))
}
