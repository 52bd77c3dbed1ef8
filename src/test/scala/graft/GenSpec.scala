package graft

import org.apache.spark.sql.functions._

import graft.gen.TransactionGen
import graft.schema.Transactions

/** Generator invariants — SURVEY §2.1 S3 (`FD/producer.py:52-124`). */
class GenSpec extends SparkSpec {

  lazy val txns = TransactionGen.batch(spark, 1000, seed = 42).cache()

  test("schema matches the 20-field wire contract") {
    assert(txns.schema.fieldNames.toSeq ==
      Transactions.wireSchema.fieldNames.toSeq)
  }

  test("strict fraud/valid alternation: exactly half fraud") {
    val counts = txns.groupBy("Is_Fraud").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) == 500 && counts(1) == 500)
  }

  test("amount bands: fraud U(5000,10000), valid U(10,3000)") {
    val bad = txns.filter(
      (col("Is_Fraud") === 1 &&
        (col("Transaction_Amount") < 5000 || col("Transaction_Amount") > 10000)) ||
      (col("Is_Fraud") === 0 &&
        (col("Transaction_Amount") < 10 || col("Transaction_Amount") > 3000)))
    assert(bad.count() == 0)
  }

  test("suspicious pattern only on fraud rows, location+time move together") {
    assert(txns.filter(col("Transaction_Location") === "LOC99" &&
      col("Is_Fraud") === 0).count() == 0)
    assert(txns.filter(col("Transaction_Location") === "LOC99" &&
      col("Transaction_Time") =!= "03:00:05").count() == 0)
    // ~30% of the 500 fraud rows carry the pattern
    val n = txns.filter(col("Transaction_Location") === "LOC99").count()
    assert(n > 100 && n < 200, s"pattern count $n outside (100,200)")
  }

  test("deterministic for a fixed seed") {
    val a = TransactionGen.batch(spark, 500, seed = 7)
      .agg(sum("Transaction_Amount"), sum("Account_Balance")).collect()(0)
    val b = TransactionGen.batch(spark, 500, seed = 7)
      .agg(sum("Transaction_Amount"), sum("Account_Balance")).collect()(0)
    assert(a == b)
  }

  test("batchPortable: same invariants, md5-replayable draws") {
    val p = TransactionGen.batchPortable(spark, 1000)
    // same wire schema, same alternation
    assert(p.schema == txns.schema)
    assert(p.filter(col("Is_Fraud") === 1).count() == 500)
    // cents-exact amount bands: fraud [5000, 10000), valid [10, 3000)
    assert(p.filter(col("Is_Fraud") === 1 &&
      (col("Transaction_Amount") < 5000 ||
        col("Transaction_Amount") >= 10000)).count() == 0)
    assert(p.filter(col("Is_Fraud") === 0 &&
      (col("Transaction_Amount") < 10 ||
        col("Transaction_Amount") >= 3000)).count() == 0)
    // pattern coupling + ~30% injection hold in the portable mode too
    assert(p.filter(col("Transaction_Location") === "LOC99" &&
      col("Is_Fraud") === 0).count() == 0)
    assert(p.filter(col("Transaction_Location") === "LOC99" &&
      col("Transaction_Time") =!= "03:00:05").count() == 0)
    val n = p.filter(col("Transaction_Location") === "LOC99").count()
    assert(n > 100 && n < 200, s"pattern count $n outside (100,200)")
    // md5 draws: reruns are identical with no seed state at all
    val a = p.agg(sum("Transaction_Amount")).collect()(0)
    val b = TransactionGen.batchPortable(spark, 1000)
      .agg(sum("Transaction_Amount")).collect()(0)
    assert(a == b)
  }

  test("2-second cadence on the Time column") {
    val ts = txns.orderBy("Time").select("Time").limit(3)
      .collect().map(_.getLong(0))
    assert(ts(1) - ts(0) == 2 && ts(2) - ts(1) == 2)
  }
}
