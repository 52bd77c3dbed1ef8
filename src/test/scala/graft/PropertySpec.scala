package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.LogGrammar

/** Property-based round trips — SURVEY §5.4. Plain ScalaCheck generators
  * driven over deterministic seeds (the scalatest bridge isn't in the
  * offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  val amounts: Gen[Double] =
    Gen.chooseNum(0L, 999999999L).map(_ / 100.0) // exact 2dp doubles
  val probs: Gen[Double] =
    Gen.chooseNum(0, 10000).map(_ / 10000.0) // exact 4dp doubles
  val ids: Gen[Long] = Gen.chooseNum(1L, 999999L)

  test("property: block format → parse recovers amount/probability/labels") {
    // one spark job over 30 generated cases (cheaper than 30 jobs)
    val cases = (1 to 30).map { i =>
      (sample(amounts, i), sample(probs, 100 + i), sample(ids, 200 + i),
        (i % 2), ((i / 2) % 2))
    }
    val df = cases.toDF("amount", "prob", "id", "pred", "actual")
    val block = LogGrammar.formatBlock(
      txnId = concat(lit("TXN"), $"id"), custId = lit("CUST1"),
      amount = $"amount", typ = lit("Online"), merchant = lit("M"),
      location = lit("LOC1"), device = lit("D"),
      date = lit("2025-01-01"), time = lit("00:00:00"),
      prediction = $"pred", actual = $"actual", probability = $"prob")
    val out = df.select($"amount", $"prob", $"id", $"pred", $"actual",
      LogGrammar.parseBlock(block).as("m"))
    val bad = out.filter(
      LogGrammar.amountOf($"m") =!= $"amount" ||
      LogGrammar.probabilityOf($"m") =!= $"prob" ||
      LogGrammar.predictedOf($"m") =!= $"pred" ||
      LogGrammar.actualOf($"m") =!= $"actual" ||
      $"m".getItem("transaction_id") =!= concat(lit("TXN"), $"id"))
    assert(bad.count() == 0)
  }

  test("property: threshold labeling is monotone in the threshold") {
    val df = (1 to 50).map(i => i / 50.0).toDF("p").cache()
    def countAbove(th: Double): Long =
      df.filter(($"p" >= th).cast("int") === 1).count()
    val pairs = (1 to 20).map { i =>
      val a = sample(Gen.chooseNum(0, 100), 300 + i)
      val b = sample(Gen.chooseNum(0, 100), 400 + i)
      (math.min(a, b) / 100.0, math.max(a, b) / 100.0)
    }
    pairs.foreach { case (lo, hi) =>
      assert(countAbove(lo) >= countAbove(hi), s"($lo, $hi)")
    }
  }

  test("property: StringIndexer codes are deterministic, sorted-domain") {
    (1 to 5).foreach { i =>
      val values = sample(
        Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")), 500 + i)
      val df = values.toDF("v")
      def codes = new org.apache.spark.ml.feature.StringIndexer()
        .setInputCol("v").setOutputCol("c").setStringOrderType("alphabetAsc")
        .fit(df).transform(df).select("v", "c").distinct()
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val c1 = codes
      assert(c1 == codes) // refit ⇒ same codes
      val sorted = values.distinct.sorted
      assert(sorted.zipWithIndex.forall { case (v, j) => c1(v) == j.toDouble })
    }
  }

  test("S5: csv scan round trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = "l_orderkey LONG, l_quantity DOUBLE, l_returnflag STRING"
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).first.getDouble(0) ==
      li.agg(sum("l_quantity")).first.getDouble(0))
  }
}
