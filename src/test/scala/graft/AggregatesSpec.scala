package graft

import org.apache.spark.sql.functions._

import graft.ops.Aggregates

/** Metric aggregates against hand-computed fixtures — SURVEY §5.2:
  * formulas (confusion, MCC, log-loss, AUC, PR threshold) verified on
  * tiny frames where the expected value is derivable by hand.
  */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  // y=[1,1,1,0,0], p=[0.9,0.6,0.4,0.6,0.2], pred@0.5=[1,1,0,1,0]
  lazy val scored = Seq(
    (1, 0.9, 1), (1, 0.6, 1), (1, 0.4, 0), (0, 0.6, 1), (0, 0.2, 0)
  ).toDF("label", "proba", "pred")

  test("gini: hand pair-difference sums, equality and max-inequality") {
    import graft.ops.Aggregates
    // [0, 1] (cents 0, 100): S = 100, n=2, total=100 → G = 0.5;
    // constant group → S=0, G=0; [1,2,3] cents 100,200,300:
    // S = (100)+(200)+(100) = 400, G = 400/(3·600) = 0.222222
    val df = Seq(("m", 0.0), ("m", 1.0), ("k", 5.0), ("k", 5.0),
      ("t", 1.0), ("t", 2.0), ("t", 3.0)).toDF("g", "v")
    val got = Aggregates.gini(df, "v", "g")
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(got("m") == ((100L, 0.5)))
    assert(got("k") == ((0L, 0.0)))
    assert(got("t") == ((400L, 0.222222)), s"got ${got("t")}")
  }

  test("abTest: hand 2x2 chi-square") {
    import graft.ops.Aggregates
    // (10,10) vs (5,15): expected row*col/n → chi2 = 2.666667 at 6dp
    val df = (Seq.fill(10)((0, 0)) ++ Seq.fill(10)((0, 1)) ++
      Seq.fill(5)((1, 0)) ++ Seq.fill(15)((1, 1))).toDF("variant", "conv")
    val r = Aggregates.abTest(df, "variant", "conv").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 10L, 5L, 15L)))
    assert(r.getDouble(4) == 2.666667, s"chi2 ${r.getDouble(4)}")
  }

  test("topShare: first-rank threshold, tie takes exactly k, hand values") {
    import graft.ops.Aggregates
    // group a: cents [100, 300, 300, 500, 900] (values /100). n=5,
    // top 40% → k=2: threshold t = 500 (cum desc: 900→1, 500→2),
    // top = 900 + 500 = 1400. group b: ties AT the threshold:
    // [200, 200, 200, 800], k=⌈4·0.4⌉=2 → t=200? cum: 800→1,
    // 200→4 ≥ 2 → t=200, above=1, top = 800 + (2−1)·200 = 1000.
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 3.0), ("a", 5.0),
      ("a", 9.0), ("b", 2.0), ("b", 2.0), ("b", 2.0), ("b", 8.0))
      .toDF("g", "v")
    val got = Aggregates.topShare(df, "v", "g", pctNum = 2, pctDen = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((5L, 2100L, 2L, 1400L)), s"got ${got("a")}")
    assert(got("b") == ((4L, 1400L, 2L, 1000L)), s"got ${got("b")}")
  }

  test("expectations: one-pass counts, null predicates are violations") {
    import graft.ops.Expectations
    val df = Seq((1, Option(5)), (2, Option(50)), (3, None))
      .toDF("id", "x")
    val got = Expectations.check(df, Seq(
      "x_small" -> ($"x" < 10),   // null x → NULL predicate → violation
      "id_pos" -> ($"id" > 0),
      "never" -> lit(false)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got("x_small") == ((2L, 3L, false)), "50 fails, null counts too")
    assert(got("id_pos") == ((0L, 3L, true)))
    assert(got("never") == ((3L, 3L, false)))
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
    // rule names never round-trip through column-identifier parsing:
    // dots, backticks, spaces are all legal in a human-readable name
    val weird = Expectations.check(df, Seq(
      "price.positive" -> ($"id" > 0),
      "has `tick` and space" -> ($"x" < 10)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(weird == Map("price.positive" -> 0L,
      "has `tick` and space" -> 2L))
  }

  test("quantileNormalize: hand-computed rank mapping, identity on one group") {
    import graft.ops.Aggregates
    // A = [1,2], B = [10,20,30]; pooled sorted = [1,2,10,20,30], N=5.
    // A: r=1 → p=⌈5/2⌉=3 → 10; r=2 → p=5 → 30.
    // B: r=1 → p=2 → 2; r=2 → p=4 → 20; r=3 → p=5 → 30.
    val df = Seq(("A", 1L), ("A", 2L), ("B", 10L), ("B", 20L),
      ("B", 30L)).toDF("g", "x")
    val got = Aggregates.quantileNormalize(df, "x", "g")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getLong(3)).toMap
    assert(got == Map(("A", 1L) -> 10L, ("A", 2L) -> 30L,
      ("B", 10L) -> 2L, ("B", 20L) -> 20L, ("B", 30L) -> 30L))
    // single group: its distribution IS the pooled one → identity
    val one = Seq(("z", 5L), ("z", 5L), ("z", 9L), ("z", 1L))
      .toDF("g", "x")
    val id = Aggregates.quantileNormalize(one, "x", "g")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(id == Map(5L -> 5L, 9L -> 9L, 1L -> 1L))
  }

  test("luhnValid: known test vectors") {
    import graft.ops.Cleaning
    // 79927398713 is THE textbook valid Luhn string; single-digit edit
    // and adjacent transposition must both fail; 16-digit Visa test PAN
    val df = Seq("79927398713", "79927398710", "79927398173",
      "4539148803436467", "4539148803436468")
      .toDF("pan")
    val got = df.withColumn("ok", Cleaning.luhnValid("pan"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("79927398713") && got("4539148803436467"))
    assert(!got("79927398710") && !got("79927398173")
      && !got("4539148803436468"))
  }

  test("benfordProfile: string digit extraction, hand expected values") {
    import graft.ops.Aggregates
    // cents strings: 100→"100" d=1, 19.99→"1999" d=1, 2.5→"250" d=2,
    // 30→"3000" d=3; zero/negative/null rows drop
    val df = Seq(("g", 1.00), ("g", 19.99), ("g", 2.50), ("g", 30.00),
      ("g", 0.0), ("g", -5.0)).toDF("grp0", "v")
      .union(Seq(("g", Option.empty[Double])).toDF("grp0", "v"))
    val rows = Aggregates.benfordProfile(df, "v", "grp0")
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set(1, 2, 3))
    assert(rows(1)._1 == 2L && rows(2)._1 == 1L && rows(3)._1 == 1L)
    val exp1 = 4.0 * (math.log(2.0) / math.log(10.0))
    assert(approx(rows(1)._2, math.rint(exp1 * 1e6) / 1e6, 1e-9))
    val chi1 = (2.0 - exp1) * (2.0 - exp1) / exp1
    assert(approx(rows(1)._3, chi1, 1e-5))
  }

  test("targetEncode: smoothed + leave-one-out by hand") {
    import graft.ops.Encodings
    // cat a: y=[1,1,0] (n=3, Σ=2); cat b: y=[0] singleton. μ=2/4, m=2:
    //   te(a) = (2 + 2·0.5)/(3+2) = 0.6; te(b) = (0+1)/3
    //   loo(a, y=1) = (2−1)/2 = 0.5; loo(a, y=0) = 2/2 = 1.0; loo(b) null
    val df = Seq(("a", 1), ("a", 1), ("a", 0), ("b", 0)).toDF("cat", "y")
    val got = Encodings.targetEncode(df, "cat", "y", m = 2)
      .select($"cat", $"y", $"te", $"loo").distinct()
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got(("a", 1)) == ((0.6, Some(0.5))))
    assert(got(("a", 0)) == ((0.6, Some(1.0))))
    assert(got(("b", 0))._1 == 1.0 / 3 && got(("b", 0))._2.isEmpty)
  }

  test("featureHash: md5 bucket + sign assignment, nulls skipped") {
    import graft.ops.Encodings
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = Seq(("x", Some(7)), ("x", None), ("y", Some(7)))
      .toDF("a", "b")
    val long = Encodings.featureHashLong(df, Seq("a", "b"))
      .select($"token", $"bucket", $"sign").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(long.length == 5) // 3 a-cells + 2 non-null b-cells
    long.foreach { case (tok, bucket, sign) =>
      val h = md5hex(tok)
      assert(bucket == h.substring(0, 3), s"$tok bucket")
      val expSign = if ("01234567".contains(h.charAt(3))) 1 else -1
      assert(sign == expSign, s"$tok sign")
    }
    // identical tokens hash identically across rows
    val b7 = long.filter(_._1 == "b=7").map(t => (t._2, t._3)).distinct
    assert(b7.length == 1)
  }

  test("histogramQuantiles: integer first-rank rule on a hand histogram") {
    import graft.ops.Aggregates
    // grp a: buckets 0×5, 3×4, 9×1 (N=10): p50→0 (cum 5 ≥ 5),
    // p90→3 (cum 9 ≥ 9), p99→9; grp z: single bucket 7 for all qs
    val hist = Seq(
      ("a", 0, 5L), ("a", 3, 4L), ("a", 9, 1L), ("z", 7, 2L)
    ).toDF("grp", "bucket", "c")
    val got = Aggregates.histogramQuantiles(hist, Seq(50, 90, 99))
      .as[(String, Int, Int)].collect()
      .map { case (g, q, b) => (g, q) -> b }.toMap
    assert(got == Map(("a", 50) -> 0, ("a", 90) -> 3, ("a", 99) -> 9,
      ("z", 50) -> 7, ("z", 90) -> 7, ("z", 99) -> 7))
  }

  test("confusion counts tn/fp/fn/tp") {
    val r = Aggregates.confusionCounts(scored, "label", "pred").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 1L, 1L, 2L)))
  }

  test("binary metric battery matches hand computation") {
    val m = Aggregates.binaryMetrics(
      Aggregates.confusionCounts(scored, "label", "pred")).collect()(0)
    assert(approx(m.getAs[Double]("accuracy"), 60.0))
    assert(approx(m.getAs[Double]("precision_weighted"), 0.6))
    assert(approx(m.getAs[Double]("recall_weighted"), 0.6))
    assert(approx(m.getAs[Double]("f1_weighted"), 0.6))
    assert(approx(m.getAs[Double]("specificity"), 0.5))
    assert(approx(m.getAs[Double]("false_positive_rate"), 0.5))
    assert(approx(m.getAs[Double]("false_negative_rate"), 1.0 / 3))
    assert(approx(m.getAs[Double]("matthews_corrcoef"), 1.0 / 6))
  }

  test("roc auc with average-rank ties = 0.75") {
    val r = Aggregates.rocAuc(scored, "label", "proba").collect()(0)
    assert(approx(r.getAs[Double]("roc_auc"), 0.75))
  }

  test("grouped roc auc ≡ per-group ungrouped, single-class group null") {
    val byModel = Seq(
      ("a", 1, 0.9), ("a", 0, 0.2), ("a", 1, 0.7), ("a", 0, 0.7),
      ("b", 1, 0.4), ("b", 0, 0.6), ("b", 1, 0.8), ("b", 0, 0.1),
      ("c", 1, 0.9), ("c", 1, 0.3),
      (null, 1, 0.8), (null, 0, 0.2)).toDF("model", "label", "proba")
    val grouped = Aggregates.rocAucByGroup(byModel, "label", "proba",
      Seq("model")).collect()
      .map(r => Option(r.getString(0)) -> Option(r.get(1))).toMap
    for (m <- Seq("a", "b")) {
      val single = Aggregates.rocAuc(byModel.filter($"model" === m),
        "label", "proba").collect()(0).getDouble(0)
      assert(grouped(Some(m)).contains(single),
        s"model $m grouped=${grouped(Some(m))} single=$single")
    }
    assert(grouped(Some("c")).isEmpty, "single-class group must yield null")
    // a null group key is a real group: its rows must not silently
    // vanish in the grouped prefix-sum joins (null-safe equality)
    assert(grouped.contains(None), "null group dropped")
    assert(grouped(None).contains(1.0), s"null-group auc ${grouped(None)}")
  }

  test("zscorePerGroup keeps null-group rows (null-safe moments join)") {
    val df = Seq(("a", 1.0), ("a", 3.0), (null, 2.0), (null, 4.0))
      .toDF("g", "v")
    val z = Aggregates.zscorePerGroup(df, "g", "v")
    assert(z.count() == 4, "null-group rows must survive the join")
    val nulls = z.filter($"g".isNull).select("z").as[Double].collect().sorted
    // null group: mean 3, sample std √2 → z = ±1/√2
    assert(math.abs(nulls(0) + 1 / math.sqrt(2)) < 1e-9)
    assert(math.abs(nulls(1) - 1 / math.sqrt(2)) < 1e-9)
  }

  test("roc auc null on single-class input") {
    val one = Seq((1, 0.9), (1, 0.2)).toDF("label", "proba")
    assert(Aggregates.rocAuc(one, "label", "proba").collect()(0).isNullAt(0))
  }

  test("optimal threshold picks f1-max (th=0.4, f1=6/7)") {
    val r = Aggregates.optimalThreshold(scored, "label", "proba").collect()(0)
    assert(approx(r.getAs[Double]("optimal_threshold"), 0.4))
    assert(approx(r.getAs[Double]("best_f1"), 6.0 / 7))
  }

  test("thresholdBattery: adjusted confusion metrics at the PR-optimal th") {
    // thresholds desc: 0.9 → f1 .5; 0.8 → 2/3; 0.3 → 4/7; 0.2 → .75 (max)
    val rows = Seq((1, 0.9), (0, 0.8), (1, 0.8), (0, 0.3), (1, 0.2))
      .toDF("label", "proba")
    val hist = Aggregates.scoreHistogram(rows, "label", "proba")
    val r = Aggregates.thresholdBattery(hist).collect()(0)
    assert(approx(r.getAs[Double]("optimal_threshold"), 0.2))
    assert(approx(r.getAs[Double]("best_f1"), 0.75))
    // at th=0.2 everything is predicted positive: tp=3 fp=2 tn=0 fn=0
    assert(approx(r.getAs[Double]("precision_adj"), 0.6))
    assert(approx(r.getAs[Double]("recall_adj"), 1.0))
    assert(approx(r.getAs[Double]("accuracy_adj"), 60.0))
    assert(r.getAs[Long]("predicted_adjusted_total") == 5L)
    // rank-sum AUC with the 0.8 tie: R1 = 1 + 3.5 + 5 → U1 = 3.5 → 7/12
    assert(approx(r.getAs[Double]("roc_auc"), 3.5 / 6))
  }

  test("thresholdBattery: empty on single-class input") {
    val one = Seq((0, 0.9), (0, 0.2)).toDF("label", "proba")
    val hist = Aggregates.scoreHistogram(one, "label", "proba")
    assert(Aggregates.thresholdBattery(hist).count() == 0)
  }

  test("log loss matches direct computation") {
    val expected = -(math.log(0.9) + math.log(0.6) + math.log(0.4) +
      math.log(1 - 0.6) + math.log(1 - 0.2)) / 5
    val r = Aggregates.logLoss(scored, "label", "proba").collect()(0)
    assert(approx(r.getAs[Double]("log_loss"), expected))
  }

  test("log loss clips extreme probabilities (no infinities)") {
    val ext = Seq((1, 0.0), (0, 1.0)).toDF("label", "proba")
    val v = Aggregates.logLoss(ext, "label", "proba")
      .collect()(0).getAs[Double]("log_loss")
    assert(!v.isInfinite && v > 30) // -ln(1e-15) ≈ 34.5
  }

  test("calibration: hand-computed Brier and 10-bin ECE") {
    // bin9: (1,.9)(1,.9)(0,.9) → |Σy−Σp|=.7; bin1: (0,.1)(1,.1) → .8;
    // bin0: (0,.05) → .05. ECE=(0.7+0.8+0.05)/6; Brier=Σ(p−y)²/6
    val df = Seq((1, 0.9), (1, 0.9), (0, 0.9), (0, 0.1), (1, 0.1),
      (0, 0.05)).toDF("label", "proba")
    val r = Aggregates.calibration(df, "label", "proba").collect()(0)
    assert(approx(r.getAs[Double]("ece"), 1.55 / 6))
    assert(approx(r.getAs[Double]("brier"), 1.6525 / 6))
    assert(r.getAs[Long]("n_bins") == 3L)
    // p = 1.0 clamps into the top bin rather than opening an 11th
    val edge = Seq((1, 1.0), (1, 0.95)).toDF("label", "proba")
    val e = Aggregates.calibration(edge, "label", "proba").collect()(0)
    assert(e.getAs[Long]("n_bins") == 1L)
  }

  test("mode per group uses pandas tie-break (smallest value)") {
    val df = Seq(("a", 2), ("a", 1), ("a", 2), ("a", 1), ("a", 3), ("b", 9))
      .toDF("g", "v")
    val m = Aggregates.modePerGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m("a") == 1) // 1 and 2 both appear twice → smallest wins
    assert(m("b") == 9)
  }

  test("last value per key follows the highest ordinal") {
    val df = Seq(("f", 1L, 10.0), ("f", 3L, 30.0), ("f", 2L, 20.0),
      ("n", 5L, 50.0)).toDF("k", "ord", "v")
    val m = Aggregates.lastPerKey(df, "k", "ord", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("f") == 30.0 && m("n") == 50.0)
  }

  test("sketch profile: HLL within rsd, quantiles within rank tolerance") {
    val df = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val r = Aggregates.sketchProfile(df, "user_id", "value").collect()(0)
    val approxD = r.getLong(0); val exactD = r.getLong(1)
    assert(math.abs(approxD - exactD) <= exactD * 0.15,
      s"hll $approxD vs exact $exactD")
    val exactP50 = df.stat.approxQuantile("value", Array(0.5), 0.0)(0)
    assert(math.abs(r.getDouble(2) - exactP50) <=
      math.max(1.0, exactP50 * 0.05), s"p50 ${r.getDouble(2)} vs $exactP50")
    assert(r.getDouble(3) >= r.getDouble(2)) // p99 ≥ p50
  }

  test("tailN returns last n in ascending display order") {
    val df = (1L to 20L).toDF("ord")
    val got = Aggregates.tailN(df, "ord", 5).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(16L, 17L, 18L, 19L, 20L))
  }

  test("misra-gries heavy hitters survive eviction; recount is exact") {
    import graft.ops.Aggregates
    // 3 hot values in a sea of 20k singletons; capacity 50 << 20003
    // distinct forces constant eviction, and repartition(16) forces
    // partial-summary merges. Guarantee: freq > n/(cap+1) = 26000/51
    // ≈ 510 → all three hot values must be proposed, recount is exact.
    val rows = Seq.fill(3000)("hot1") ++ Seq.fill(2000)("hot2") ++
      Seq.fill(1000)("hot3") ++ (1 to 20000).map(i => s"cold$i")
    val df = rows.toDF("v").repartition(16)
    val top = Aggregates.exactTopKByFreq(df, "v", 3, 50).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("hot1", "hot2", "hot3"))
    assert(top.map(_.getLong(1)).toSeq == Seq(3000L, 2000L, 1000L))
  }

  test("winsorize clips each group to its own percentile band") {
    // group a: 1..10 plus outlier 1000 (n=11). rank = p·(n-1):
    //   p05 → rank 0.5 → 1.5 ; p95 → rank 9.5 → (10+1000)/2 = 505
    // group b: 100..109 plus outlier -50:
    //   p05 → (-50+100)/2 = 25 ; p95 → (108+109)/2 = 108.5
    val df = ((1 to 10).map(v => ("a", v.toDouble)) :+ ("a", 1000.0)) ++
      ((100 to 109).map(v => ("b", v.toDouble)) :+ ("b", -50.0))
    val w = Aggregates.winsorize(df.toDF("g", "v"), "g", "v")
      .select("g", "v", "w").as[(String, Double, Double)].collect()
    assert(w.length == 22)
    val a = w.filter(_._1 == "a")
    assert(a.find(_._2 == 1.0).get._3 == 1.5)     // raised to lo
    assert(a.find(_._2 == 1000.0).get._3 == 505.0) // capped to hi
    assert(a.count(r => r._3 == r._2) == 9)        // 2..10 untouched
    val b = w.filter(_._1 == "b")
    assert(b.find(_._2 == -50.0).get._3 == 25.0)
    assert(b.find(_._2 == 109.0).get._3 == 108.5)
  }

  test("winsorize integer bounds keep an integral column integral") {
    val df = ((1 to 10).map(v => ("a", v.toLong)) :+ ("a", 1000L))
      .toDF("g", "v")
    val w = Aggregates.winsorize(df, "g", "v", integerBounds = true)
      .select("v", "w").as[(Long, Long)].collect().toMap
    assert(w(1L) == 2L)     // lo = round(1.5) = 2
    assert(w(1000L) == 505L)
    assert(w(5L) == 5L)
  }

  test("winsorize approx mode: sketch bounds are real data values near the exact rank") {
    // the exact-vs-approx CONTRACT, pinned: exact interpolates (p95 of
    // 1..10 ∪ 1000 is 505.0 — not a data value); approx returns an
    // ACTUAL corpus value whose rank is within n/accuracy of p. With
    // accuracy >> n the sketch is rank-exact, so the bound is the data
    // value at the percentile rank — never an interpolated midpoint.
    val df = ((1 to 10).map(v => ("a", v.toDouble)) :+ ("a", 1000.0))
      .toDF("g", "v")
    val exact = Aggregates.winsorize(df, "g", "v")
      .select("v", "w").as[(Double, Double)].collect().toMap
    assert(exact(1000.0) == 505.0) // interpolated midpoint of 10 and 1000
    val approx = Aggregates.winsorize(df, "g", "v", approx = true)
      .select("v", "w").as[(Double, Double)].collect().toMap
    val values = (1 to 10).map(_.toDouble).toSet + 1000.0
    assert(values.contains(approx(1000.0)), approx(1000.0).toString)
    assert(values.contains(approx(1.0)), approx(1.0).toString)
    // rank-exact at this accuracy: p95 of 11 values → the 10th or 11th
    // order statistic, p05 → the 1st or 2nd
    assert(Set(10.0, 1000.0).contains(approx(1000.0)))
    assert(Set(1.0, 2.0).contains(approx(1.0)))
    // untouched interior rows agree between modes
    assert((3 to 9).forall(v => approx(v.toDouble) == v.toDouble))
  }

  test("winsorize keeps null-group rows (null-safe bounds join)") {
    val df = Seq((Option("a"), 1.0), (Option("a"), 2.0), (Option("a"), 3.0),
      (Option.empty[String], 7.0), (Option.empty[String], 8.0))
      .toDF("g", "v")
    val w = Aggregates.winsorize(df, "g", "v")
    assert(w.count() == 5)
    assert(w.filter(col("g").isNull).count() == 2)
  }

  test("ksDrift: hand-computed D on overlapping samples, exact numerator") {
    // E=[1,2,3,4], A=[3,4,5,6]: F_E-F_A peaks at 0.5 (v=2..4)
    val e = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val a = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = Aggregates.ksDrift(e, a, "v").first()
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)
    assert(r.getLong(2) == 8, s"ks_num ${r.getLong(2)}") // 8/16 = 0.5
    assert(r.getDouble(3) == 0.5)
  }

  test("robustZscorePerGroup: hand-computed median/MAD, null on zero MAD") {
    // a: [1,2,3,4,100] → med 3 (3rd of 5), devs {0,1,1,2,97} → mad 1;
    // the 100 outlier gets z = 0.6745·97, the median itself z = 0.
    // b: constant group → mad 0 → z null. c (even N): lower medians.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0), ("b", 5.0), ("b", 5.0),
      ("c", 1.0), ("c", 2.0), ("c", 3.0), ("c", 4.0)).toDF("g", "v")
    val out = Aggregates.robustZscorePerGroup(df, "g", "v",
        zCol = "z", keepStats = true)
      .select($"g", $"v", $"robust_med", $"robust_mad", $"z")
      .as[(String, Double, Double, Double, Option[Double])]
      .collect().map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(out(("a", 100.0)) == ((3.0, 1.0, Some(0.6745 * 97.0))))
    assert(out(("a", 3.0)) == ((3.0, 1.0, Some(0.0))))
    assert(out(("a", 1.0))._3 == Some(0.6745 * -2.0))
    assert(out(("b", 5.0)) == ((5.0, 0.0, None)))
    assert(out(("c", 2.0)) == ((2.0, 1.0, Some(0.0))))
    assert(out(("c", 4.0))._3 == Some(0.6745 * 2.0))
  }

  test("robustZscorePerGroupApprox: matches exact when accuracy >= n") {
    // the bounded-memory contract: with accuracy >= group size the
    // percentile_approx sketch's rank error is < 1, so medians, MADs
    // and every z must equal the exact lower-median path — on odd,
    // even, constant (MAD 0 → null z) and heavy-outlier groups alike
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0), ("b", 5.0), ("b", 5.0),
      ("c", 1.0), ("c", 2.0), ("c", 3.0), ("c", 4.0)).toDF("g", "v")
    def key(r: (String, Double, Double, Double, Option[Double])) =
      (r._1, r._2) -> ((r._3, r._4, r._5))
    val exact = Aggregates.robustZscorePerGroup(df, "g", "v",
        zCol = "z", keepStats = true)
      .select($"g", $"v", $"robust_med", $"robust_mad", $"z")
      .as[(String, Double, Double, Double, Option[Double])]
      .collect().map(key).toMap
    val approx = Aggregates.robustZscorePerGroupApprox(df, "g", "v",
        zCol = "z", keepStats = true, accuracy = 1000)
      .select($"g", $"v", $"robust_med", $"robust_mad", $"z")
      .as[(String, Double, Double, Double, Option[Double])]
      .collect().map(key).toMap
    assert(approx === exact)
    // the approx result is always an ACTUAL data value (rank-bounded
    // selection, never interpolation) even at minimum accuracy
    val coarse = Aggregates.robustZscorePerGroupApprox(df, "g", "v",
        zCol = "z", keepStats = true, accuracy = 2)
      .select($"g", $"robust_med").distinct()
      .as[(String, Double)].collect().toMap
    assert(Set(1.0, 2.0, 3.0, 4.0, 100.0).contains(coarse("a")))
  }

  test("chi2Drift: hand-computed 2x2 terms, zero on identical mixes") {
    // E=[a,a,a,b], A=[a,b,b,b]: margins give exp=2 per cell, so each
    // category contributes (3-2)^2/2 + (1-2)^2/2 = 1.0
    val e = Seq("a", "a", "a", "b").toDF("c")
    val a = Seq("a", "b", "b", "b").toDF("c")
    val r = Aggregates.chi2Drift(e, a, "c").orderBy($"c")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(("a", 3L, 1L, 1.0), ("b", 1L, 3L, 1.0)), r.toString)
    // identical mixes → every term 0; a one-sided category still rows
    val e2 = Seq("a", "b").toDF("c")
    val r2 = Aggregates.chi2Drift(e2, e2, "c")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r2.forall(_._4 == 0.0), r2.toString)
    val oneSided = Aggregates.chi2Drift(e2, Seq("a", "z").toDF("c"), "c")
      .as[(String, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(oneSided("z") == ((0L, 1L)) && oneSided("b") == ((1L, 0L)),
      oneSided.toString)
  }

  test("equidepthBins: even split, heavy value keeps its group whole") {
    // [1,1,1,1,2,3,4,5] k=2: value 1 fills bin 0 exactly; 2..5 bin 1
    val even = Seq(1.0, 1.0, 1.0, 1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val r1 = Aggregates.equidepthBins(even, "v", k = 2)
      .orderBy($"bin").as[(Long, Double, Double, Long)].collect().toSeq
    assert(r1 == Seq((0L, 1.0, 1.0, 4L), (1L, 2.0, 5.0, 4L)), r1.toString)
    // [1×5, 2×3] k=2: value 1 straddles the midpoint but stays whole —
    // bin 0 oversized (5), bin 1 undersized (3)
    val heavy = Seq(1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0).toDF("v")
    val r2 = Aggregates.equidepthBins(heavy, "v", k = 2)
      .orderBy($"bin").as[(Long, Double, Double, Long)].collect().toSeq
    assert(r2 == Seq((0L, 1.0, 1.0, 5L), (1L, 2.0, 2.0, 3L)), r2.toString)
    // nulls are excluded before ranking
    val withNull = Seq(Some(1.0), None, Some(2.0), Some(3.0), Some(4.0))
      .toDF("v")
    val r3 = Aggregates.equidepthBins(withNull, "v", k = 2)
      .orderBy($"bin").as[(Long, Double, Double, Long)].collect().toSeq
    assert(r3 == Seq((0L, 1.0, 2.0, 2L), (1L, 3.0, 4.0, 2L)), r3.toString)
  }

  test("portable sketches: HLL/KMV estimates near exact, integer registers") {
    // 500 distinct keys, duplicated rows — duplicates must not move
    // either estimator (register max / distinct-frontier semantics)
    val df = ((1 to 500) ++ (1 to 200)).toDF("k")
    val r = Aggregates.distinctSketchesPortable(df, "k").collect()(0)
    val exact = r.getLong(r.fieldIndex("n_exact"))
    val hll = r.getDouble(r.fieldIndex("hll_raw_est"))
    val kmv = r.getDouble(r.fieldIndex("kmv_est"))
    assert(exact == 500L)
    // m=16 raw HLL: 1.04/sqrt(16) = 26% std err; allow 3 sigma
    assert(math.abs(hll - 500) / 500.0 < 0.78, s"hll=$hll")
    // KMV k=64: ~13% std err; allow 3 sigma
    assert(math.abs(kmv - 500) / 500.0 < 0.39, s"kmv=$kmv")
  }

  test("portable CMS: estimates always >= exact; tight when sparse") {
    // width 4 forces collisions among 40 keys → strict overestimate on
    // at least one heavy key; never an underestimate on any
    val df = ((1 to 40) ++ Seq.fill(30)(7) ++ Seq.fill(20)(13)).toDF("k")
    val r = Aggregates.cmsHeavyKeysPortable(df, "k", depth = 2, width = 4,
      k = 5).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val exact = row.getLong(row.fieldIndex("n_exact"))
      val cms = row.getLong(row.fieldIndex("n_cms"))
      assert(cms >= exact, s"${row.getString(0)}: cms=$cms < exact=$exact")
    }
    // top key is 7 (31 occurrences) and its bucket absorbed collisions
    assert(r.head.getString(0) == "7" && r.head.getLong(1) == 31L)
  }

  test("ksDrift: identical samples give D = 0") {
    val e = Seq(1.0, 2.0, 2.0, 9.0).toDF("v")
    val r = Aggregates.ksDrift(e, e, "v").first()
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0)
  }

  test("psiDrift: bin counts, clamped outliers, formula match") {
    // one expected value per bin; actual concentrated in bin 5 with
    // outliers beyond both edges clamping to bins 0 and 9
    val e = (0 to 9).map(i => i + 0.5).toDF("v")
    val a = Seq(5.51, 5.52, 5.53, -100.0, 100.0).toDF("v")
    val rows = Aggregates.psiDrift(e, a, "v", bins = 10)
      .orderBy(col("bin")).collect()
    val byBin = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.map(_.getLong(1)).sum == 10)
    assert(rows.map(_.getLong(2)).sum == 5)
    assert(byBin(5L)._2 == 3 && byBin(0L)._2 == 1 && byBin(9L)._2 == 1)
    // replicate the smoothed formula for bin 5 (nE=1, nA=3, NE=10, NA=5)
    val expected = BigDecimal(
      (2.0 / 20 - 4.0 / 15) * math.log((2.0 * 15) / (4.0 * 20)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byBin(5L)._3 == expected, s"${byBin(5L)._3} vs $expected")
    // (p-q) and ln(p/q) always share sign → every PSI term is >= 0
    assert(rows.forall(_.getDouble(3) >= 0), rows.mkString(","))
  }

  test("kendallTauB: monotone = 1, reversed = -1, ties match scipy") {
    import spark.implicits._
    def tau(rows: Seq[(Long, Long)]) =
      graft.ops.Aggregates.kendallTauB(rows.toDF("x", "y"), "x", "y")
        .first()
    val up = tau(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    assert(up.getDouble(4) == 1.0 && up.getLong(3) == 0L, up.toString)
    val down = tau(Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L)))
    assert(down.getDouble(4) == -1.0, down.toString)
    // ties on both axes: x=[1,2,2,3], y=[1,3,2,2] → C=3, D=1,
    // n0=6, tx=1 (the tied x=2 pair), ty=1 (tied y=2 pair),
    // τ-b = (3−1)/√((6−1)(6−1)) = 0.4
    val t = tau(Seq((1L, 1L), (2L, 3L), (2L, 2L), (3L, 2L)))
    assert(t.getLong(1) == 6L && t.getLong(2) == 3L &&
      t.getLong(3) == 1L, t.toString)
    assert(math.abs(t.getDouble(4) - 0.4) < 1e-7, t.toString)
    // all-tied axis → null
    val degen = tau(Seq((1L, 5L), (2L, 5L), (3L, 5L)))
    assert(degen.isNullAt(4), degen.toString)
  }

  test("welchT matches the closed form; dof sits in [min-1, n-2]") {
    import spark.implicits._
    val rows = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(10L, 20L).map(("b", _))).toDF("g", "x")
    val r = graft.ops.Aggregates.welchT(rows, "g", "x", "a", "b").first()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.5 && r.getDouble(3) == 15.0)
    val va = (30.0 - 4 * 2.5 * 2.5) / 3  // 5/3
    val vb = (500.0 - 2 * 15.0 * 15.0) / 1  // 50
    val wa = va / 4; val wb = vb / 2
    val wantT = math.rint((2.5 - 15.0) / math.sqrt(wa + wb) * 1e7) / 1e7
    val wantDof = math.rint((wa + wb) * (wa + wb) /
      (wa * wa / 3 + wb * wb / 1) * 1e7) / 1e7
    assert(math.abs(r.getDouble(4) - wantT) < 2e-7,
      s"${r.getDouble(4)} vs $wantT")
    assert(math.abs(r.getDouble(5) - wantDof) < 2e-7,
      s"${r.getDouble(5)} vs $wantDof")
    assert(r.getDouble(5) >= 1.0 && r.getDouble(5) <= 4.0,
      "Welch dof bounds")
  }

  test("welchT: a singleton group yields null t and dof") {
    import spark.implicits._
    val rows = Seq(("a", 1L), ("a", 5L), ("b", 9L)).toDF("g", "x")
    val r = graft.ops.Aggregates.welchT(rows, "g", "x", "a", "b").first()
    assert(r.isNullAt(4) && r.isNullAt(5), r.toString)
  }

  test("cramersV: identity mapping = 1, product table = 0, 1-col = null") {
    import spark.implicits._
    def v(rows: Seq[(String, String)]) =
      graft.ops.Aggregates.cramersV(rows.toDF("a", "b"), "a", "b").first()
    val ident = v(Seq.fill(5)(("x", "x")) ++ Seq.fill(3)(("y", "y")))
    assert(ident.getDouble(4) == 1.0, ident.toString)
    assert(math.abs(ident.getDouble(3) - 8.0) < 1e-5, "chi2 = n·min(r-1,c-1)")
    val indep = v(for { a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 4 } yield (a, b))
    assert(math.abs(indep.getDouble(4)) < 1e-6, indep.toString)
    val degen = v(Seq(("x", "p"), ("x", "q"), ("x", "p")))
    assert(degen.isNullAt(4), degen.toString)
  }

  test("mannWhitneyU: hand-computed ranks, ties, and z") {
    import spark.implicits._
    // A=[1,3,3], B=[2,3]: ranks 1,2,(3+4+5)/3=4 -> R1=1+4+4=9,
    // U1=9-6=3, mu=3 -> z=0; ties term 3^3-3=24
    val df = Seq(("a", 1L), ("a", 3L), ("a", 3L), ("b", 2L), ("b", 3L))
      .toDF("g", "x")
    val r = graft.ops.Aggregates.mannWhitneyU(df, "g", "x", "a", "b")
      .head()
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("u1") === 3.0)
    assert(r.getAs[Double]("z") === 0.0)
    // no ties, full separation: A=[10,20] above B=[1,2] -> U1=4,
    // sigma^2=(4/12)*5=5/3, z=2/sqrt(5/3)
    val df2 = Seq(("a", 10L), ("a", 20L), ("b", 1L), ("b", 2L))
      .toDF("g", "x")
    val r2 = graft.ops.Aggregates.mannWhitneyU(df2, "g", "x", "a", "b")
      .head()
    assert(r2.getAs[Double]("u1") === 4.0)
    assert(approx(r2.getAs[Double]("z"),
      BigDecimal(2.0 / math.sqrt(5.0 / 3.0))
        .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // degenerate: all values tie -> sig2 = 0 -> z null
    val df3 = Seq(("a", 5L), ("b", 5L)).toDF("g", "x")
    val r3 = graft.ops.Aggregates.mannWhitneyU(df3, "g", "x", "a", "b")
      .head()
    assert(r3.isNullAt(r3.fieldIndex("z")))
  }

  test("spearmanRho: classic no-tie formula, tie midranks, " +
       "constant guard") {
    // no ties: rho = 1 - 6*sum(d^2)/(n(n^2-1)) = 1 - 6*4/120 = 0.8
    val df = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 5L))
      .toDF("x", "y")
    val r = graft.ops.Aggregates.spearmanRho(df, "x", "y").head()
    assert(r.getAs[Long]("n") === 5L)
    assert(approx(r.getAs[Double]("rho"), 0.8))
    // ties in x: midranks [1.5, 1.5, 3] vs [1, 2, 3]:
    // cov = 0.5, vx = 0.5, vy = 2/3 -> rho = 0.5/sqrt(1/3)
    val df2 = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    val r2 = graft.ops.Aggregates.spearmanRho(df2, "x", "y").head()
    assert(approx(r2.getAs[Double]("rho"),
      BigDecimal(0.5 / math.sqrt(1.0 / 3.0))
        .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // constant x -> zero rank variance -> null
    val df3 = Seq((7L, 1L), (7L, 2L)).toDF("x", "y")
    val r3 = graft.ops.Aggregates.spearmanRho(df3, "x", "y").head()
    assert(r3.isNullAt(r3.fieldIndex("rho")))
  }

  test("kruskalWallisH: hand-computed 2-group H, tie correction, " +
       "degenerate guards") {
    // a=[1,2], b=[3,4]: ranks 1..4, R_a=3, R_b=7,
    // H = 12/20 * (9/2 + 49/2) - 15 = 2.4, no ties
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "x")
    val r = graft.ops.Aggregates.kruskalWallisH(df, "g", "x").df.head()
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("k") === 2L)
    assert(approx(r.getAs[Double]("h"), 2.4))
    // every value ties -> correction hits 0 -> null
    val df2 = Seq(("a", 5L), ("b", 5L), ("c", 5L)).toDF("g", "x")
    val r2 = graft.ops.Aggregates.kruskalWallisH(df2, "g", "x").df.head()
    assert(r2.isNullAt(r2.fieldIndex("h")))
    // single group -> k < 2 -> null
    val df3 = Seq(("a", 1L), ("a", 2L)).toDF("g", "x")
    val r3 = graft.ops.Aggregates.kruskalWallisH(df3, "g", "x").df.head()
    assert(r3.isNullAt(r3.fieldIndex("h")))
  }

  test("theilSen: outlier-proof slope, lower-median rule, weights") {
    // y = 2x + 1 with one wild outlier: pair slopes sorted
    // [2, 2, 2, 33, 48.5, 95], W=6, lower-median rank 3 -> slope 2;
    // residuals y - 2x = [1, 1, 1, 94], N=4, rank 2 -> intercept 1
    val df = Seq((0L, 1L), (1L, 3L), (2L, 5L), (3L, 100L)).toDF("x", "y")
    val r = graft.ops.Aggregates.theilSen(df, "x", "y").df.head()
    assert(r.getAs[Long]("w_pairs") === 6L)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
    // duplicate rows act as cell weights: doubling the (1,3) row
    // gives slope-2 pairs weight 5 of W=9, so the rank-5 lower
    // median stays 2 (hand cum: 2->5, 33->6, 48.5->8, 95->9)
    val dfW = df.union(Seq((1L, 3L)).toDF("x", "y"))
    val rw = graft.ops.Aggregates.theilSen(dfW, "x", "y").df.head()
    assert(rw.getAs[Long]("w_pairs") === 9L)
    assert(rw.getAs[Double]("slope") === 2.0)
  }

  test("theilSen/kendallTauB refuse an unquantized (cells > maxCells) " +
      "input, naming the quantization contract") {
    // a continuous-style column: every row its own cell, so the pair
    // join would be rows² — the guard must refuse BEFORE planning it
    val wide = (1L to 50L).map(i => (i, i * 7 + 3)).toDF("x", "y")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Aggregates.theilSen(wide, "x", "y", maxCells = 10).df
        .head()
    }
    assert(e1.getMessage.contains("quantization contract"),
      e1.getMessage)
    assert(e1.getMessage.contains("maxCells=10"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Aggregates.kendallTauB(wide, "x", "y", maxCells = 10)
        .head()
    }
    assert(e2.getMessage.contains("quantization contract"),
      e2.getMessage)
    // quantized inputs (few distinct cells) pass under the same cap
    val q = wide.select((col("x") % 3).as("x"), (col("y") % 2).as("y"))
    assert(graft.ops.Aggregates.theilSen(q, "x", "y", maxCells = 10)
      .df.count() === 1L)
  }

  test("cohensKappa: hand-computed agreement, degenerate constant pair") {
    // tn=40 fp=10 fn=20 tp=30: po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(40)((0, 0)) ++ Seq.fill(10)((0, 1)) ++
      Seq.fill(20)((1, 0)) ++ Seq.fill(30)((1, 1))
    val cm = graft.ops.Aggregates.confusionCounts(
      rows.toDF("label", "pred"), "label", "pred")
    val r = graft.ops.Aggregates.cohensKappa(cm).head()
    assert(r.getAs[Long]("n") === 100L)
    assert(approx(r.getAs[Double]("po"), 0.7))
    assert(approx(r.getAs[Double]("pe"), 0.5))
    assert(approx(r.getAs[Double]("kappa"), 0.4))
    // constant pair: pe = 1 -> kappa undefined (null)
    val cm2 = graft.ops.Aggregates.confusionCounts(
      Seq((1, 1), (1, 1)).toDF("label", "pred"), "label", "pred")
    val r2 = graft.ops.Aggregates.cohensKappa(cm2).head()
    assert(r2.isNullAt(r2.fieldIndex("kappa")))
  }

  test("giniPerGroup: equality, total concentration, hand case, " +
    "negative refusal") {
    val rows = (
      Seq.fill(5)(("eq", 7L)) ++                       // all equal → 0
      Seq(("one", 0L), ("one", 0L), ("one", 0L), ("one", 10L)) ++
      Seq(("hand", 1L), ("hand", 2L), ("hand", 3L), ("hand", 4L)) ++
      Seq(("neg", -1L), ("neg", 5L))
    ).toDF("g", "v")
    val got = graft.ops.Aggregates.giniPerGroup(rows, "g", "v")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("eq").contains(0.0), got.toString)
    // one holder of everything over n=4: G = (n−1)/n = 0.75
    assert(got("one").contains(0.75), got.toString)
    // 1,2,3,4: T = 30, S = 10 → 2·30/40 − 5/4 = 0.25
    assert(got("hand").contains(0.25), got.toString)
    assert(got("neg").isEmpty, got.toString)
  }
}
