package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.WireFormat

/** Self-verifying Kafka deploy probe — SURVEY §2.1 S1/S2 transport.
  *
  * The reference's transport (`FD/producer.py:14-17,133`,
  * `FD/consumer.py:104-109`) is a Kafka topic; this build's container
  * carries no `spark-sql-kafka` artifact, so the codec and options
  * contract are covered connector-less (StreamSpec) and the endpoint
  * itself can't execute. This main makes the deploy story
  * self-verifying the day the jar appears:
  *
  *   - probes whether the `kafka` DSV2 provider resolves on THIS
  *     classpath (the same lookup `format("kafka")` performs);
  *   - absent → prints an actionable skip (exit 0: a clean skip, not
  *     a failure);
  *   - present → runs a real produce/consume round-trip against
  *     `SPARK_GRAFT_KAFKA` (default localhost:9092) on a throwaway
  *     topic: N wire-encoded rows batch-written, read back from
  *     earliest, decoded, counted.
  */
object KafkaSmoke {

  /** True iff the `kafka` DataSource provider resolves — the exact
    * registry + classpath lookup a `format("kafka")` read performs,
    * without touching any broker.
    */
  def providerPresent(spark: SparkSession): Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("kafka", spark.sessionState.conf)
      true
    } catch { case _: Throwable => false }

  /** The skip diagnostic (exposed for the spec): what's missing and
    * what to add where.
    */
  def skipMessage: String =
    "[kafka-smoke] SKIP: no 'kafka' DataSourceV2 provider on the " +
      "classpath. Add org.apache.spark:spark-sql-kafka-0-10_2.13 " +
      "(matching this Spark version) and its kafka-clients dependency " +
      "to the deploy classpath, then rerun. The wire codec, options " +
      "contract, and dead-letter split are already covered " +
      "connector-less by StreamSpec."

  def main(args: Array[String]): Unit = {
    val spark = Jobs.session("kafka-smoke")
    try {
      if (!providerPresent(spark)) { println(skipMessage); return }
      val bootstrap = sys.env.getOrElse("SPARK_GRAFT_KAFKA", "localhost:9092")
      val topic = s"graft_smoke_${System.currentTimeMillis()}"
      val n = 100
      println(s"[kafka-smoke] provider present; round-trip of $n rows " +
        s"via $bootstrap topic $topic")
      val rows = graft.gen.TransactionGen.batch(spark, n, seed = 7L)
      WireFormat.encodeFrame(rows).write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
      val back = WireFormat.decodeFrame(
        spark.read.format("kafka")
          .option("kafka.bootstrap.servers", bootstrap)
          .option("subscribe", topic)
          .option("startingOffsets", "earliest")
          .option("endingOffsets", "latest")
          .load())
      val got = back.filter(col("transaction_id").isNotNull).count()
      if (got == n) println(s"[kafka-smoke] PASS: $got/$n rows round-tripped")
      else {
        println(s"[kafka-smoke] FAIL: $got/$n rows round-tripped")
        sys.exit(1)
      }
    } finally spark.stop()
  }
}
