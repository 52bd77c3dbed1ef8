package graft

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.gen.TransactionGen
import graft.ml.TrainingJob
import graft.schema.Transaction
import graft.streaming.Scorer

/** S10: the relational sink exercised end-to-end against embedded Derby
  * (on the classpath via Spark's Hive-metastore dependencies) — the
  * reference only declares its psycopg2 factory and never calls it
  * (`FD/consumer.py:28-35`); here the JDBC path actually runs, including
  * the delete-then-append idempotence that makes checkpoint replay
  * exactly-once in effect.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val artifacts = TrainingJob.run(
    TransactionGen.batch(spark, 1500, seed = 42), fast = true)

  private def txns(n: Int, seed: Long): Seq[Transaction] =
    TransactionGen.batch(spark, n, seed = seed).as[Transaction]
      .collect().toSeq

  private def derbyUrl(name: String): String = {
    val dir = Files.createTempDirectory(s"graft-derby-$name").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("jdbc micro-batches land in Derby and replay is idempotent") {
    val url = derbyUrl("batch")
    val props = new Properties()
    val table = "scored_txns"

    val b0 = TransactionGen.batch(spark, 7, seed = 11)
    val b1 = TransactionGen.batch(spark, 5, seed = 12)
    Scorer.writeJdbcBatch(b0, 0L, url, table, props)
    Scorer.writeJdbcBatch(b1, 1L, url, table, props)
    val after2 = spark.read.jdbc(url, table, props)
    assert(after2.count() == 12)
    assert(after2.select(countDistinct(col("batch_id"))).first().getLong(0) == 2)

    // a retried batch REPLACES its own rows instead of re-appending
    Scorer.writeJdbcBatch(b1, 1L, url, table, props)
    val after3 = spark.read.jdbc(url, table, props)
    assert(after3.count() == 12)
    assert(after3.filter(col("batch_id") === 1).count() == 5)
    // and the surviving rows are the batch's rows, not stale partials
    val ids = after3.filter(col("batch_id") === 1)
      .select("Transaction_ID").as[String].collect().toSet
    val expect = b1.select("Transaction_ID").as[String].collect().toSet
    assert(ids == expect)
  }

  test("scored stream drives the jdbc sink through two micro-batches") {
    val url = derbyUrl("stream")
    val props = new Properties()
    val ckpt = Files.createTempDirectory("graft-jdbc-ckpt").toString
    val stream = MemoryStream[Transaction](spark)
    val scored = Scorer.score(stream.toDF(),
      artifacts.features, artifacts.production)
    val q = Scorer.jdbcWriter(scored, url, "scored_stream", ckpt).start()
    try {
      stream.addData(txns(6, seed = 21): _*)
      q.processAllAvailable()
      stream.addData(txns(4, seed = 22): _*)
      q.processAllAvailable()
      val got = spark.read.jdbc(url, "scored_stream", props)
      assert(got.count() == 10)
      // scored columns made it through (prediction + probability present)
      assert(got.columns.contains("prediction_label"))
      assert(got.filter(col("fraud_probability").between(0.0, 1.0)).count() == 10)
      // batch ids distinguish the two micro-batches
      assert(got.select(countDistinct(col("batch_id"))).first().getLong(0) == 2)
    } finally q.stop()
  }
}
