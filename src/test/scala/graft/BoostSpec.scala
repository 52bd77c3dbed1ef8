package graft

import graft.ops.Boost

/** Gradient-boosted stumps: exact round-1 XGBoost gain/weight
  * arithmetic on a hand-computed fixture, monotone margin behavior,
  * degenerate-input contract. Engine↔oracle parity lives on m22.
  */
class BoostSpec extends SparkSpec {
  import spark.implicits._

  // perfectly separable on x1; x2 constant (never a valid split)
  lazy val toy = Seq(
    (0, 1L, 7L), (0, 1L, 7L), (0, 1L, 7L),
    (1, 2L, 7L), (1, 2L, 7L), (1, 2L, 7L)
  ).toDF("y", "x1", "x2")

  test("round 1 reproduces the hand-computed gain and leaf weights") {
    // p = 0.5 everywhere: cell(x1=1): g = 1.5, h = 0.75; cell(x1=2):
    // g = -1.5, h = 0.75. Split x1<=1: gain = 2.25/1.75 + 2.25/1.75
    // - 0/2.5 = 2.571428571(4); w_left = -1.5/1.75 = -0.857142857
    val r = Boost.trainStumps(toy, "y", Seq("x1", "x2"), rounds = 1)
      .first()
    assert(r.getAs[String]("feat") == "x1", s"feat: $r")
    assert(r.getAs[Long]("threshold") == 1L)
    assert(math.abs(r.getAs[Double]("gain") - 2.571428571) < 1e-6)
    assert(math.abs(r.getAs[Double]("w_left") + 0.857142857) < 1e-8)
    assert(math.abs(r.getAs[Double]("w_right") - 0.857142857) < 1e-8)
    assert(r.getAs[Long]("tp") == 3L && r.getAs[Long]("tn") == 3L &&
      r.getAs[Long]("fp") == 0L && r.getAs[Long]("fn") == 0L)
    assert(r.getAs[Double]("acc") == 1.0)
  }

  test("later rounds keep the separable fixture at perfect accuracy " +
    "and emit one row per round") {
    val out = Boost.trainStumps(toy, "y", Seq("x1", "x2"), rounds = 3)
      .orderBy("boost_round").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Int]("boost_round")).toSeq == Seq(1, 2, 3))
    out.foreach { r =>
      assert(r.getAs[Double]("acc") == 1.0, s"round $r")
      // margins move apart, so every leaf keeps pushing the same way
      assert(r.getAs[Double]("w_left") < 0 &&
        r.getAs[Double]("w_right") > 0, s"round $r")
    }
  }

  test("a real second feature can win a later round") {
    // x1 separates 4/6 rows; x2 separates the remaining 2 — boosting
    // should pick x1 first (bigger gain), then lean on x2
    val mixed = Seq(
      (1, 10L, 0L), (1, 10L, 0L), (1, 10L, 5L), (0, 1L, 5L),
      (0, 1L, 0L), (1, 1L, 0L), (0, 10L, 5L), (0, 1L, 5L)
    ).toDF("y", "x1", "x2")
    val out = Boost.trainStumps(mixed, "y", Seq("x1", "x2"), rounds = 4)
      .orderBy("boost_round").collect()
    assert(out.length == 4)
    assert(out.head.getAs[String]("feat") == "x1")
    assert(out.map(_.getAs[String]("feat")).toSet == Set("x1", "x2"),
      "both features should participate across rounds")
  }

  test("degenerate inputs yield zero rows with the full schema") {
    val one = Seq((1, 5L, 5L), (0, 5L, 5L)).toDF("y", "x1", "x2")
    val out = Boost.trainStumps(one, "y", Seq("x1", "x2"))
    assert(out.count() == 0, "single distinct cell has no valid split")
    assert(out.columns.toSeq == Seq("boost_round", "feat", "threshold",
      "gain", "w_left", "w_right", "tp", "fp", "fn", "tn", "acc"))
    val empty = Seq.empty[(Int, Long, Long)].toDF("y", "x1", "x2")
    assert(Boost.trainStumps(empty, "y", Seq("x1", "x2")).count() == 0)
  }

  test("shap: the label-carrying feature owns the attribution and " +
    "the signed mean centers at zero") {
    // y depends on x1 only; x2 is a shuffled index with no signal
    val rows = (1 to 60).map(i =>
      (if (i % 2 == 0) 1 else 0, (i % 2 + 10).toLong, (i * 7 % 13).toLong))
      .toDF("y", "x1", "x2")
    val shap = Boost.shapStumps(rows, "y", Seq("x1", "x2"), rounds = 3)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(r.fieldIndex("mean_shap")),
          r.getDouble(r.fieldIndex("mean_abs_shap")))).toMap
    // E[φ] = 0 per feature by expectation-centering (exact, not approx)
    shap.values.foreach { case (mean, _) => assert(mean == 0.0, shap) }
    assert(shap("x1")._2 > 10 * math.max(shap("x2")._2, 1e-12), s"$shap")
  }

  test("shap local accuracy: base + attribution reconstructs the " +
    "ensemble's mean margin") {
    // Σ_j (base_j + mean_shap_j) = E[margin] — Shapley efficiency in
    // expectation; mean_shap is exactly 0, so Σ base_j must equal the
    // cnt-weighted mean of the trained margin
    val rows = (1 to 80).map(i =>
      (if ((i * 3) % 7 < 3) 1 else 0, (i % 5).toLong, (i % 4).toLong))
      .toDF("y", "x1", "x2")
    val model = Boost.trainStumps(rows, "y", Seq("x1", "x2"), rounds = 3)
      .collect()
    val shap = Boost.shapStumps(rows, "y", Seq("x1", "x2"), rounds = 3)
      .collect()
    val sumBase = shap.map(_.getDouble(1)).sum
    // recompute the mean margin from the split literals
    val data = rows.collect().map(r => (r.getLong(1), r.getLong(2)))
    val meanMargin = data.map { case (x1, x2) =>
      model.map { m =>
        val x = if (m.getAs[String]("feat") == "x1") x1 else x2
        0.3 * (if (x <= m.getAs[Long]("threshold"))
          m.getAs[Double]("w_left") else m.getAs[Double]("w_right"))
      }.sum
    }.sum / data.length
    assert(math.abs(sumBase - meanMargin) < 1e-5,
      s"sum base $sumBase vs mean margin $meanMargin")
  }

  test("driver-local training == the distributed pipeline " +
      "(splits, confusion, shap) on the mixed fixture") {
    import org.apache.spark.sql.functions._
    val mixed = Seq(
      (1, 10L, 0L), (1, 10L, 0L), (1, 10L, 5L), (0, 1L, 5L),
      (0, 1L, 0L), (1, 1L, 0L), (0, 10L, 5L), (0, 1L, 5L)
    ).toDF("y", "x1", "x2")
    val feats = Seq("x1", "x2")
    val localOut = Boost.trainStumps(mixed, "y", feats, rounds = 4)
      .orderBy("boost_round").collect().map(_.toSeq).toSeq
    val hist = mixed
      .filter(col("x1").isNotNull && col("x2").isNotNull &&
        col("y").isNotNull)
      .groupBy(col("x1").cast("long").as("x1"),
        col("x2").cast("long").as("x2"))
      .agg(count(lit(1)).as("cnt"), sum(col("y").cast("long")).as("pos"))
      .persist()
    hist.count()
    val (distOut, distSplits) =
      Boost.trainDistributed(hist, feats, rounds = 4, lr = 0.3,
        lambda = 1.0)
    assert(localOut ==
      distOut.orderBy("boost_round").collect().map(_.toSeq).toSeq)
    val localShap = Boost.shapStumps(mixed, "y", feats, rounds = 4)
      .collect().map(_.toSeq).toSeq
    val distShap = Boost.shapDistributed(hist, distSplits, feats,
      lr = 0.3).collect().map(_.toSeq).toSeq
    assert(localShap == distShap)
    hist.unpersist()
  }
}
