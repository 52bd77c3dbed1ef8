package graft

import org.apache.spark.sql.functions._

import graft.ops.LogGrammar

/** Log-block grammar round trip — SURVEY §2.1 S6/S7, §2.3 F10-F16
  * (FIXTURES.md §3: both consumer variants + junk blocks).
  */
class LogGrammarSpec extends SparkSpec {
  import spark.implicits._

  test("format → parse round trip recovers typed fields") {
    val df = Seq((4711L, 123L, 9743.33, "Online", 0.8123))
      .toDF("txn", "cust", "amount", "typ", "prob")
    val block = LogGrammar.formatBlock(
      txnId = concat(lit("TXN"), $"txn"),
      custId = concat(lit("CUST"), $"cust"),
      amount = $"amount", typ = $"typ",
      merchant = lit("MERC1"), location = lit("LOC99"), device = lit("DEV1"),
      date = lit("2025-03-30"), time = lit("03:00:05"),
      prediction = lit(1), actual = lit(0), probability = $"prob")
    val m = df.select(LogGrammar.parseBlock(block).as("m"))
    val row = m.select(
      $"m".getItem("transaction_id"),
      LogGrammar.amountOf($"m"),
      LogGrammar.predictedOf($"m"),
      LogGrammar.actualOf($"m"),
      LogGrammar.probabilityOf($"m"),
      $"m".getItem("date")).collect()(0)
    assert(row.getString(0) == "TXN4711")
    assert(row.getDouble(1) == 9743.33)
    assert(row.getInt(2) == 1)
    assert(row.getInt(3) == 0)
    assert(row.getDouble(4) == 0.8123)
    assert(row.getString(5) == "2025-03-30")
  }

  test("older variant without Actual Fraud Status parses with defaults") {
    val block =
      s"""${LogGrammar.delimiter}
         |New Transaction Received:
         |Transaction ID: TXN1
         |Amount: $$12.50
         |Fraud Prediction: VALID
         |Fraud Probability: 0.0100
         |${LogGrammar.delimiter}""".stripMargin
    val m = Seq(block).toDF("b").select(LogGrammar.parseBlock($"b").as("m"))
    val row = m.select(
      LogGrammar.actualOf($"m"), LogGrammar.predictedOf($"m"),
      LogGrammar.amountOf($"m")).collect()(0)
    assert(row.getInt(0) == 0) // absent ground truth → 0
    assert(row.getInt(1) == 0)
    assert(row.getDouble(2) == 12.50)
  }

  test("junk blocks yield defaults, not errors") {
    val m = Seq("", "no structure here", "weird: : colons :")
      .toDF("b").select(LogGrammar.parseBlock($"b").as("m"))
    val rows = m.select(LogGrammar.amountOf($"m"),
      LogGrammar.probabilityOf($"m")).collect()
    assert(rows.forall(r => r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0))
  }

  test("producer-variant block: Sent header, Fraud Status, no prediction") {
    val block = Seq(1).toDF("x").select(LogGrammar.formatProducerBlock(
      txnId = lit("TXN1"), custId = lit("CUST1"), amount = lit(12.5),
      typ = lit("POS"), merchant = lit("M"), location = lit("LOC1"),
      device = lit("ATM"), date = lit("2025-01-01"), time = lit("10:00:00"),
      isFraud = lit(0)).as("b")).collect()(0).getString(0)
    assert(block.contains("New Transaction Sent:"))
    assert(block.contains("Fraud Status: VALID"))
    assert(!block.contains("Fraud Prediction"))
    // parses through the same grammar
    val m = Seq(block).toDF("b")
      .select(LogGrammar.parseBlock($"b").as("m"))
      .select($"m".getItem("fraud_status"), LogGrammar.amountOf($"m"))
      .collect()(0)
    assert(m.getString(0) == "VALID" && m.getDouble(1) == 12.5)
  }

  test("native parseBlock ≡ composable spelling on real and junk blocks") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val block = LogGrammar.formatBlock(
      txnId = concat(lit("TXN"), col("o_orderkey")),
      custId = concat(lit("CUST"), col("o_custkey")),
      amount = col("o_totalprice"), typ = col("o_orderpriority"),
      merchant = lit("M"), location = lit("L"), device = lit("D"),
      date = lit("2025-01-01"), time = lit("00:00:00"),
      prediction = lit(1), actual = lit(0),
      probability = (col("o_custkey") % 100) / 100.0)
    val both = df.select(
      LogGrammar.parseBlock(block).as("native"),
      LogGrammar.parseBlockComposable(block).as("composable"))
    val diff = both.filter(
      to_json(map_entries($"native")) =!= to_json(map_entries($"composable")))
    assert(diff.count() == 0)

    // junk parity (no-dup rows; map_from_entries throws on dup keys)
    val junk = Seq("", "no colons", "weird: : colons :")
      .toDF("b").select(
        LogGrammar.parseBlock($"b").as("n"),
        LogGrammar.parseBlockComposable($"b").as("c"))
    val junkDiff = junk.filter(
      to_json(map_entries($"n")) =!= to_json(map_entries($"c")))
    assert(junkDiff.count() == 0)
    // intentional divergence: native parser is last-win on dup keys
    val dupRow = Seq("a: b\nc: d\na: e").toDF("b")
      .select(LogGrammar.parseBlock($"b").as("n"))
      .collect()(0).getMap[String, String](0)
    assert(dupRow("a") == "e")
  }

  test("any-':' line splits like the reference (header → empty-valued key)") {
    // FD/evaluation.py:65-70: `if ':' in line` + `split(':', 1)` — the
    // header line itself lands in the map with an empty value, and a
    // no-space `k:v:x` line splits on the FIRST colon only
    val m = Seq("New Transaction Received:\nTransaction ID: TXN9\nOdd:Line:x")
      .toDF("b").select(LogGrammar.parseBlock($"b").as("m"))
      .collect()(0).getMap[String, String](0)
    assert(m("new_transaction_received") == "")
    assert(m("transaction_id") == "TXN9")
    assert(m("odd") == "Line:x")
    // consumer-block variant: header key present alongside data fields
    val full = Seq(1).toDF("x").select(LogGrammar.formatBlock(
      txnId = lit("TXN1"), custId = lit("CUST1"), amount = lit(1.0),
      typ = lit("POS"), merchant = lit("M"), location = lit("L"),
      device = lit("D"), date = lit("2025-01-01"), time = lit("00:00:00"),
      prediction = lit(0), actual = lit(0), probability = lit(0.5)).as("b"))
      .select(LogGrammar.parseBlock($"b").as("m"))
      .collect()(0).getMap[String, String](0)
    assert(full("new_transaction_received") == "")
    assert(full("transaction_id") == "TXN1")
  }

  test("formatted block matches the reference grammar literally") {
    // FIXTURES.md §3: 68-char '=' delimiter, header, '-' rule, field
    // order, $-amount with 2dp, probability with 4dp
    val block = Seq(1).toDF("x").select(LogGrammar.formatBlock(
      txnId = lit("TXN457986"), custId = lit("CUST96906"),
      amount = lit(9743.33), typ = lit("Online"), merchant = lit("MERC4521"),
      location = lit("LOC99"), device = lit("Mobile"),
      date = lit("2025-03-30"), time = lit("03:00:05"),
      prediction = lit(1), actual = lit(1), probability = lit(0.8123))
      .as("b")).collect()(0).getString(0)
    val lines = block.split("\n")
    assert(lines(1) == "=" * 68)
    assert(lines(2) == "New Transaction Received:")
    assert(lines(3) == "-" * 68)
    assert(lines(4) == "Transaction ID: TXN457986")
    assert(lines(6) == "Amount: $9743.33")
    assert(lines(13) == "Fraud Prediction: FRAUD")
    assert(lines(14) == "Actual Fraud Status: FRAUD")
    assert(lines(15) == "Fraud Probability: 0.8123")
    assert(lines.last == "=" * 68)
  }

  test("splitBlocks splits a whole log on 60+ '=' runs") {
    val text = s"header\n${"=" * 68}\nblock one\nTransaction ID: TXN1\n" +
      s"${"=" * 68}\n\n${"=" * 68}\nblock two\nTransaction ID: TXN2\n${"=" * 68}"
    val blocks = Seq(text).toDF("t")
      .select(explode(LogGrammar.splitBlocks($"t")).as("block"))
    val valid = graft.ops.Cleaning.validBlocks(blocks)
    assert(valid.count() == 2)
  }
}
