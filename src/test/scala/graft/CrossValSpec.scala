package graft

import org.apache.spark.sql.functions._

import graft.ops.{Anomaly, CrossVal}

/** Single-pass k-fold CV and closed-form LOO influence — the complement
  * algebra must agree with literally refitting on the other folds, and
  * the hat-based LOO residual must agree with literally deleting the
  * row (the λ=0 exact identities).
  */
class CrossValSpec extends SparkSpec {
  import spark.implicits._

  // integer-valued features, y = 3·x1 + 2·x2 + small deterministic noise
  lazy val rows = (1 to 60).map { i =>
    val x1 = i.toLong
    val x2 = ((i * 7) % 13).toLong
    (i.toString, x1, x2, 3 * x1 + 2 * x2 + ((i % 5) - 2))
  }.toDF("id", "x1", "x2", "y")

  test("foldOf: values in [0,k), deterministic, roughly uniform") {
    val f = (1 to 1000).map(_.toString).toDF("id")
      .select(CrossVal.foldOf(col("id"), 4).as("f"))
    val counts = f.groupBy("f").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set(0, 1, 2, 3)))
    counts.values.foreach(c => assert(c > 150 && c < 350, s"skewed: $counts"))
    // deterministic across evaluations
    val again = (1 to 1000).map(_.toString).toDF("id")
      .select(CrossVal.foldOf(col("id"), 4).as("f"))
      .groupBy("f").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("foldOf rejects k that does not divide 16") {
    intercept[IllegalArgumentException] {
      CrossVal.foldOf(col("id"), 5)
    }
  }

  test("complement model equals a literal refit on the other folds") {
    val cv = CrossVal.kFoldRidge2(rows, "id", "x1", "x2", "y",
      k = 4, lambda = 10.0).collect()
    assert(cv.length == 4)
    val withFold = rows.withColumn("f", CrossVal.foldOf(col("id"), 4))
    cv.foreach { r =>
      val fold = r.getInt(r.fieldIndex("fold"))
      val direct = Anomaly.ridge2PerGroup(
        withFold.filter(col("f") =!= fold).withColumn("g", lit("g")),
        "g", "x1", "x2", "y", lambda = 10.0).first()
      assert(approx(r.getDouble(r.fieldIndex("b1")),
        direct.getDouble(direct.fieldIndex("b1")), 1e-4))
      assert(approx(r.getDouble(r.fieldIndex("b2")),
        direct.getDouble(direct.fieldIndex("b2")), 1e-4))
      assert(approx(r.getDouble(r.fieldIndex("b0")),
        direct.getDouble(direct.fieldIndex("b0")), 1e-4))
      assert(r.getLong(r.fieldIndex("n_train")) +
        r.getLong(r.fieldIndex("n_test")) == 60)
    }
  }

  test("an exact plane cross-validates to zero mse at lambda = 0") {
    val exact = (1 to 40).map { i =>
      val x1 = i.toLong; val x2 = ((i * 5) % 11).toLong
      (i.toString, x1, x2, 3 * x1 + 2 * x2 + 7)
    }.toDF("id", "x1", "x2", "y")
    val cv = CrossVal.kFoldRidge2(exact, "id", "x1", "x2", "y",
      k = 4, lambda = 0.0).collect()
    cv.foreach { r =>
      assert(r.getDouble(r.fieldIndex("mse")) == 0.0,
        s"fold ${r.getInt(0)} mse ${r.getDouble(r.fieldIndex("mse"))}")
    }
  }

  test("held-out residuals >= 1e7 stay inside the decimal width " +
      "(r11 verdict: the old decimal(14,7) threw under ANSI here)") {
    // a plane plus one 2e7-off outlier: the outlier's fold scores a
    // held-out residual ~2e7 — decimal(18,7) holds |e| < 1e11, so the
    // square/sum completes instead of overflowing
    val rows = ((1 to 40).map { i =>
      val x1 = i.toLong; val x2 = ((i * 5) % 11).toLong
      (i.toString, x1, x2, 3 * x1 + 2 * x2 + 7)
    } :+ (("99", 20L, 5L, 3 * 20 + 2 * 5 + 7 + 20000000L)))
      .toDF("id", "x1", "x2", "y")
    val cv = CrossVal.kFoldRidge2(rows, "id", "x1", "x2", "y",
      k = 4, lambda = 0.0).collect()
    assert(cv.length == 4)
    // the fold holding the outlier must carry its ~(2e7)^2 square
    val worst = cv.map(r => r.getDouble(r.fieldIndex("mse"))).max
    assert(worst > 1e13, s"outlier square missing: worst mse $worst")
  }

  test("OLS hat trace: leverages sum to the parameter count") {
    // λ=0 → H is the OLS projection; trace(H) = p = 3 (intercept + 2)
    val all = CrossVal.looInfluenceRidge2(rows, "id", "x1", "x2", "y",
      lambda = 0.0, topK = 60).collect()
    assert(all.length == 60)
    val traceH = all.map(_.getDouble(2)).sum
    assert(math.abs(traceH - 3.0) < 1e-4, s"trace $traceH")
    all.foreach(r => assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0))
  }

  test("LOO residual equals the literal delete-and-refit residual") {
    val top = CrossVal.looInfluenceRidge2(rows, "id", "x1", "x2", "y",
      lambda = 0.0, topK = 3).collect()
    top.foreach { r =>
      val id = r.getString(0)
      val refit = Anomaly.ridge2PerGroup(
        rows.filter(col("id") =!= id).withColumn("g", lit("g")),
        "g", "x1", "x2", "y", lambda = 0.0).first()
      val held = rows.filter(col("id") === id).first()
      val pred = refit.getDouble(refit.fieldIndex("b0")) +
        refit.getDouble(refit.fieldIndex("b1")) * held.getLong(1) +
        refit.getDouble(refit.fieldIndex("b2")) * held.getLong(2)
      val looDirect = held.getLong(3) - pred
      assert(math.abs(r.getDouble(3) - looDirect) < 0.05,
        s"id $id loo ${r.getDouble(3)} vs direct $looDirect")
    }
  }

  test("influence ranks the corrupted row first") {
    val poisoned = rows.withColumn("y",
      when(col("id") === "30", col("y") + 500L).otherwise(col("y")))
    val top = CrossVal.looInfluenceRidge2(poisoned, "id", "x1", "x2", "y",
      lambda = 0.0, topK = 1).first()
    assert(top.getString(0) == "30", s"top influence ${top.getString(0)}")
  }
}
