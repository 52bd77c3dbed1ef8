package graft

import org.apache.spark.sql.functions._

import graft.gen.TransactionGen
import graft.ml.{Balance, FeaturePipeline, Models, TrainingJob}
import graft.schema.Transactions

/** ML pipeline — SURVEY §2.5 M1-M12. Trained on the deterministic
  * generator (§5.2: assert formulas and contracts, not the reference's
  * absolute numbers).
  */
class MLSpec extends SparkSpec {
  import spark.implicits._

  lazy val raw = TransactionGen.batch(spark, 3000, seed = 42).cache()

  test("M1: StringIndexer alphabetAsc reproduces sklearn LabelEncoder codes") {
    val df = Seq("Savings", "Business", "Checking", "Savings").toDF("Account_Type")
    val indexer = new org.apache.spark.ml.feature.StringIndexer()
      .setInputCol("Account_Type").setOutputCol("code")
      .setStringOrderType("alphabetAsc")
    val codes = indexer.fit(df).transform(df)
      .select("Account_Type", "code").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // sklearn LabelEncoder: sorted classes → Business=0, Checking=1, Savings=2
    assert(codes == Map("Business" -> 0.0, "Checking" -> 1.0, "Savings" -> 2.0))
  }

  test("feature pipeline preserves the 15-position FEATURE_ORDER contract") {
    assert(FeaturePipeline.assemblerInputs.length == 15)
    assert(FeaturePipeline.assemblerInputs(2) == "Transaction_Amount")
    assert(FeaturePipeline.assemblerInputs(0) == "Bank_Branch_idx")
    assert(FeaturePipeline.assemblerInputs(9) == "year")
  }

  test("preprocess drops PII, keeps time components") {
    val pre = FeaturePipeline.preprocess(raw)
    Transactions.droppedColumns.foreach(c =>
      assert(!pre.columns.contains(c), s"$c should be dropped"))
    Seq("year", "month", "day", "hour", "minute", "second").foreach(c =>
      assert(pre.columns.contains(c), s"$c missing"))
  }

  test("balanced weights follow n/(k*n_c)") {
    val df = Seq.fill(30)(0).map(l => Tuple1(l)).toDF("label")
      .union(Seq.fill(10)(1).map(l => Tuple1(l)).toDF("label"))
    val w = Balance.withBalancedWeights(df, "label")
      .groupBy("label").agg(first("weight")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(approx(w(0), 40.0 / (2 * 30)))
    assert(approx(w(1), 40.0 / (2 * 10)))
  }

  test("oversampleBalanced equalizes class counts (within bernoulli noise)") {
    val df = (1 to 300).map(i => (i, 0)).toDF("x", "label")
      .union((1 to 60).map(i => (i, 1)).toDF("x", "label"))
    val counts = Balance.oversampleBalanced(df, "label")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) == 300)
    assert(math.abs(counts(1) - 300L) <= 25, s"minority ${counts(1)}")
  }

  test("malformed/missing date survives preprocessing under ANSI mode") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "premise: Spark 4 defaults ANSI on — this spec guards that path")
    val bad = raw.limit(10)
      .withColumn("Transaction_Date",
        when(monotonically_increasing_id() === 0, lit("not-a-date"))
          .when(monotonically_increasing_id() === 1, lit(null))
          .otherwise(col("Transaction_Date")))
    // neither row may throw; both land with zero-filled time components
    val pre = graft.ml.FeaturePipeline.preprocess(bad)
    assert(pre.count() == 10)
    assert(pre.filter(col("year") === 0).count() == 2,
      "bad-date rows should zero-fill components, not NaN or crash")
    val serve = TrainingJob.servePreprocess(bad)
    assert(serve.count() == 10)
    assert(serve.filter(col("year") === 0).count() == 2)
  }

  test("end-to-end training: 3 models, full metric battery, GBT persisted") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ml").toString
    val artifacts = TrainingJob.run(raw, Some(dir), fast = true)

    val metrics = artifacts.metrics.collect()
    assert(metrics.length == 3)
    val names = metrics.map(_.getAs[String]("model")).toSet
    assert(names == Set("Logistic Regression", "Random Forest", "XGBoost"))
    metrics.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      val auc = r.getAs[Double]("roc_auc")
      // alternation ties fraud to amount bands — any real model separates
      assert(acc > 90, s"${r.getAs[String]("model")} accuracy $acc")
      assert(auc > 0.9, s"${r.getAs[String]("model")} auc $auc")
      assert(r.getAs[Double]("log_loss") > 0)
      assert(r.getAs[Double]("matthews_corrcoef") > 0.8)
    }

    // S8 round trip: reload artifacts and score the raw stream shape
    val (features, model) = TrainingJob.load(spark, dir)
    val rescored = TrainingJob.score(raw.limit(200), features, model)
    assert(rescored.filter(col("prediction_label").isin("FRAUD", "VALID"))
      .count() == 200)
    val agree = rescored
      .filter((col("prediction") === 1) === (col("Is_Fraud") === 1)).count()
    assert(agree > 180, s"reloaded model agreement $agree/200")

    // S9: metrics JSON readable back
    val mj = spark.read.json(s"$dir/model_metrics")
    assert(mj.count() == 3)
  }

  test("M8 parity: fused evaluateAll ≡ per-model evaluate on the GBT sub") {
    // closes the documented XGBoost→GBT substitution with a quantified
    // check on the METRIC side: whatever model fills the "XGBoost" slot,
    // the fused multi-model evaluator (one traversal, grouped by model)
    // must reproduce the per-model battery bit-for-bit, so the
    // model_metrics.json numbers don't depend on which evaluation path
    // produced them. Divergence from the reference's persisted xgboost
    // model remains in the MODEL (SURVEY §7.3), not the formulas.
    val pre = FeaturePipeline.preprocess(raw)
      .withColumn("label", col("Is_Fraud").cast("int"))
    val fm = FeaturePipeline.fit(pre)
    val featured = Balance.withBalancedWeights(
      fm.transform(FeaturePipeline.withRequiredFeatures(pre)), "label")
    val (train, test) = Models.split(featured)
    val gbt = new org.apache.spark.ml.classification.GBTClassifier()
      .setFeaturesCol("features").setLabelCol("label").setWeightCol("weight")
      .setSeed(42).setMaxIter(5).setMaxDepth(3).fit(train)
    val s = Models.scored(gbt, test).cache()
    val per = Models.evaluate(s).head()
    val fused = Models.evaluateAll(s.withColumn("model", lit("XGBoost")))
    assert(fused.count() == 1)
    val f = fused.head()
    val shared = per.schema.fieldNames.toSet
      .intersect(f.schema.fieldNames.toSet)
    assert(shared.size >= 10, s"only shared metrics: $shared")
    for (c <- shared) {
      val (a, b) = (per.getAs[Any](c), f.getAs[Any](c))
      (a, b) match {
        case (x: Double, y: Double) =>
          assert(x == y || math.abs(x - y) < 1e-12, s"$c: $x vs $y")
        case _ => assert(a == b, s"$c: $a vs $b")
      }
    }
    // and the model actually separates (the slot is a real classifier)
    assert(per.getAs[Double]("roc_auc") > 0.9)
    s.unpersist(blocking = false)
  }

  test("m12c parity: fixed-structure TreeScorer ≡ fitted GBT serving path") {
    // extends the M8 gate from the METRIC path to the SERVING path:
    // extract a really-fitted GBTClassificationModel's split tables and
    // replay them through the pure-column TreeScorer. Margins agree to
    // BLAS-vectorization ulps (MLlib's ddot may reorder the ensemble
    // sum when a native BLAS is loaded — measured 1-2 ulps here — so
    // exact bit-parity is pinned engine-side by the m12c oracle, and
    // THIS gate pins the scorer ≡ MLlib serving to ≤1e-12 relative).
    val df = (1 to 800).map { i =>
      val x1 = (i % 50).toDouble
      val x2 = ((i * 7) % 100) / 1000.0
      val x3 = ((i * 13) % 80) / 1000.0
      (i.toLong, x1, x2, x3, if (i % 50 < 25) 1 else 0)
    }.toDF("id", "x1", "x2", "x3", "label")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x1", "x2", "x3")).setOutputCol("features")
      .transform(df)
    val gbt = new org.apache.spark.ml.classification.GBTClassifier()
      .setFeaturesCol("features").setLabelCol("label")
      .setSeed(42).setMaxIter(5).setMaxDepth(3).fit(assembled)
    val trees = graft.ml.TreeScorer.fromGbt(gbt, Seq("x1", "x2", "x3"))
    assert(trees.length == 5 && trees.head._1 == 1.0)
    val twin = graft.ml.TreeScorer.scoreGbt(df, trees)
      .select(col("id"), col("margin"), col("proba"), col("pred"))
    val mllib = gbt.transform(assembled).select(col("id"),
      element_at(org.apache.spark.ml.functions
        .vector_to_array(col("rawPrediction")), 2).as("margin_ml"),
      element_at(org.apache.spark.ml.functions
        .vector_to_array(col("probability")), 2).as("proba_ml"),
      col("prediction").cast("int").as("pred_ml"))
    val rows = twin.join(mllib, "id").collect()
    assert(rows.length == 800)
    rows.foreach { r =>
      val (m, mMl) = (r.getAs[Double]("margin"), r.getAs[Double]("margin_ml"))
      assert(math.abs(m - mMl) <= 1e-12 * math.max(1.0, math.abs(mMl)),
        s"margin drift at id ${r.getAs[Long]("id")}: $m vs $mMl")
      val (p, pMl) = (r.getAs[Double]("proba"), r.getAs[Double]("proba_ml"))
      assert(math.abs(p - pMl) <= 5.01e-8, // 7dp rounding of the same link
        s"proba drift: $p vs $pMl")
      if (math.abs(pMl - 0.5) > 1e-6)
        assert(r.getAs[Int]("pred") == r.getAs[Int]("pred_ml"),
          s"pred drift at proba $pMl")
    }
  }

  test("m12d parity: fixed-structure scoreRf ≡ fitted RF serving path") {
    // the m12c gate applied to forests: extract a really-fitted
    // RandomForestClassificationModel's per-leaf class votes
    // (TreeBridge.leafStats normalized — predictRaw's per-tree rule)
    // and replay them through the pure-column scorer. vote_sum must
    // match rawPrediction(1) to ≤1e-12 relative, proba the 7dp
    // rounding of probability(1), pred the argmax away from the tie.
    val df = (1 to 800).map { i =>
      val x1 = (i % 50).toDouble
      val x2 = ((i * 7) % 100) / 1000.0
      val x3 = ((i * 13) % 80) / 1000.0
      (i.toLong, x1, x2, x3, if (i % 50 < 25) 1 else 0)
    }.toDF("id", "x1", "x2", "x3", "label")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x1", "x2", "x3")).setOutputCol("features")
      .transform(df)
    val rf = new org.apache.spark.ml.classification.RandomForestClassifier()
      .setFeaturesCol("features").setLabelCol("label")
      .setSeed(42).setNumTrees(5).setMaxDepth(3).fit(assembled)
    val trees = graft.ml.TreeScorer.fromRf(rf, Seq("x1", "x2", "x3"))
    assert(trees.length == 5)
    val twin = graft.ml.TreeScorer.scoreRf(df, trees)
      .select(col("id"), col("vote_sum"), col("proba"), col("pred"))
    val mllib = rf.transform(assembled).select(col("id"),
      element_at(org.apache.spark.ml.functions
        .vector_to_array(col("rawPrediction")), 2).as("votes_ml"),
      element_at(org.apache.spark.ml.functions
        .vector_to_array(col("probability")), 2).as("proba_ml"),
      col("prediction").cast("int").as("pred_ml"))
    val rows = twin.join(mllib, "id").collect()
    assert(rows.length == 800)
    rows.foreach { r =>
      val (v, vMl) =
        (r.getAs[Double]("vote_sum"), r.getAs[Double]("votes_ml"))
      assert(math.abs(v - vMl) <= 1e-12 * math.max(1.0, math.abs(vMl)),
        s"vote drift at id ${r.getAs[Long]("id")}: $v vs $vMl")
      val (p, pMl) = (r.getAs[Double]("proba"), r.getAs[Double]("proba_ml"))
      assert(math.abs(p - pMl) <= 5.01e-8, // 7dp rounding of votes/n
        s"proba drift: $p vs $pMl")
      if (math.abs(pMl - 0.5) > 1e-6)
        assert(r.getAs[Int]("pred") == r.getAs[Int]("pred_ml"),
          s"pred drift at proba $pMl")
    }
  }

  test("M10: feature importances expose amount as a top signal") {
    val pre = FeaturePipeline.preprocess(raw)
      .withColumn("label", col("Is_Fraud").cast("int"))
    val fm = FeaturePipeline.fit(pre)
    val featured = fm.transform(FeaturePipeline.withRequiredFeatures(pre))
      .withColumn("weight", lit(1.0))
    val rf = new org.apache.spark.ml.classification.RandomForestClassifier()
      .setFeaturesCol("features").setLabelCol("label").setWeightCol("weight")
      .setNumTrees(10).setSeed(42).fit(featured)
    val top = Models.featureImportances(spark, rf.featureImportances,
      Transactions.featureOrder, k = 3)
      .collect().map(_.getString(0))
    assert(top.contains("Transaction_Amount"), top.mkString(","))
  }

  test("isotonic calibration is monotone and identity on calibrated input") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // overconfident scores: p=0.9 where empirical rate is 1/3
    val over = (Seq.fill(2)((0, 0.9)) ++ Seq((1, 0.9)) ++
      Seq.fill(3)((0, 0.2)) ++ Seq((1, 0.8), (1, 0.85), (0, 0.5)))
      .toDF("label", "proba")
    val cal = Models.isotonicCalibrate(over, "label", "proba")
      .select("proba", "calibrated")
      .orderBy(col("proba")).as[(Double, Double)].collect()
    // monotone non-decreasing in the raw score
    cal.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b >= a - 1e-12, s"calibration not monotone: $a -> $b")
    }
    assert(cal.forall { case (_, c) => c >= 0 && c <= 1 })
    // perfectly calibrated input maps (approximately) to itself:
    // each score level's empirical rate equals the score
    val perfect = (Seq.fill(9)((1, 0.9)) ++ Seq.fill(1)((0, 0.9)) ++
      Seq.fill(1)((1, 0.1)) ++ Seq.fill(9)((0, 0.1)))
      .toDF("label", "proba")
    val id = Models.isotonicCalibrate(perfect, "label", "proba")
      .select("proba", "calibrated").distinct()
      .as[(Double, Double)].collect().toMap
    assert(math.abs(id(0.9) - 0.9) < 1e-9 && math.abs(id(0.1) - 0.1) < 1e-9)
  }

  test("IRLS logistic: signal direction, MLE balance, repartition-stable") {
    import graft.ml.LogisticIrls
    // y strongly increasing in x1, x2 pure noise: after 3 Newton steps
    // b1 must be clearly positive and the model must reproduce the
    // logistic-MLE balance property Σp ≈ Σy (exact at convergence,
    // near-exact after 3 steps on a well-behaved separable-ish set)
    val rows = (1 to 400).map { i =>
      val x1 = (i % 20).toDouble
      val y = if (x1 + (i % 7) * 0.5 > 11) 1 else 0
      (y, x1, (i % 5).toDouble)
    }
    val df = rows.toDF("y", "x1", "x2")
    val s = LogisticIrls.trainSummary(df, "y", "x1", "x2").collect()(0)
    val (b1, n, probaSum) =
      (s.getDouble(1), s.getLong(3), s.getDouble(5))
    assert(b1 > 0.1, s"positive signal not learned: b1=$b1")
    val ySum = rows.map(_._1).sum.toDouble
    assert(math.abs(probaSum - ySum) / ySum < 0.02,
      s"MLE balance violated: sum(p)=$probaSum vs sum(y)=$ySum")
    assert(n == 400)
    // the engineered property: betas are BIT-identical under
    // repartitioning (every per-row term is 9dp-rounded then summed in
    // exact decimal, so partition/merge order cannot smear last bits —
    // the thing plain double sums cannot promise)
    val b = LogisticIrls.train(df, "y", "x1", "x2").collect()(0)
    val b2 = LogisticIrls.train(df.repartition(13), "y", "x1", "x2")
      .collect()(0)
    assert((0 to 2).forall(i => b.getDouble(i) == b2.getDouble(i)),
      s"betas drifted under repartition: $b vs $b2")
    // serving path: predict on held-out rows with the trained β frame
    // composes in-plan and agrees with trainSummary's own scoring
    val beta = LogisticIrls.train(df, "y", "x1", "x2")
    val served = LogisticIrls.predict(df, beta, "x1", "x2")
    assert(served.columns.toSet ==
      Set("y", "x1", "x2", "proba", "pred"))
    val nPos = served.filter($"pred" === 1).count()
    assert(math.abs(nPos - rows.count(_._1 == 1)) < 40,
      s"served positives wildly off: $nPos vs ${rows.count(_._1 == 1)}")
  }

  test("Platt scaling: direction, MLE balance, degenerate NaN signal") {
    import graft.ml.LogisticIrls
    // label probability increases with the raw score → b > 0, and the
    // calibrated probabilities reproduce the MLE balance Σp ≈ Σy
    val rows = (1 to 400).map { i =>
      val x = (i % 20).toDouble
      (if (x + (i % 7) * 0.5 > 11) 1 else 0, x)
    }
    val df = rows.toDF("y", "x")
    val s = LogisticIrls.plattSummary(df, "y", "x").collect()(0)
    assert(s.getDouble(1) > 0.1, s"positive signal not learned: $s")
    val probaSum = s.getDouble(4)
    assert(math.abs(probaSum - rows.map(_._1).sum) < 2.0,
      s"MLE balance violated: $probaSum vs ${rows.map(_._1).sum}")
    // repartition-stable (order-free decimal sums)
    val a1 = LogisticIrls.trainPlatt(df, "y", "x").collect()(0)
    val a2 = LogisticIrls.trainPlatt(df.repartition(13), "y", "x")
      .collect()(0)
    assert(a1.getDouble(0) == a2.getDouble(0) &&
      a1.getDouble(1) == a2.getDouble(1))
    // constant score: EXACTLY singular Hessian → null coefficients
    // (ANSI forbids the IEEE 0/0), not a crash
    val cs = (1 to 50).map(i => (i % 2, 3.0)).toDF("y", "x")
    val deg = LogisticIrls.trainPlatt(cs, "y", "x").collect()(0)
    assert(deg.isNullAt(0) && deg.isNullAt(1), deg.toString)
  }
}
