package graft

import org.apache.spark.sql.functions._

import graft.ops.Anomaly

/** Mahalanobis outlier screen — joint-distribution semantics the
  * per-feature z-score cannot provide, plus the degenerate guards.
  */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // a tight correlation ridge (y ≈ 10x) with one on-ridge extreme and
  // one off-ridge point that is unremarkable per-axis
  lazy val ridge = ((1 to 40).map(i => ("g", i.toLong, i * 10L + i % 3)) :+
    ("g", 60L, 600L) :+ // extends the ridge: large per-axis, on-trend
    ("g", 10L, 350L) // mid-range per-axis, far off the ridge
    ).toDF("grp", "x", "y")

  test("off-ridge point outscores the on-ridge extreme") {
    val scored = Anomaly.mahalanobis2PerGroup(ridge, "grp", "x", "y")
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        r.getDouble(r.fieldIndex("m2"))).toMap
    assert(scored((10L, 350L)) > scored((60L, 600L)),
      s"off-ridge ${scored((10L, 350L))} vs ridge ${scored((60L, 600L))}")
    // and the off-ridge point clears the chi2(2) 99.9% flag
    assert(scored((10L, 350L)) > 13.8155)
  }

  test("mean m2 equals the dimension (bivariate identity)") {
    // sum of Mahalanobis² over n points under the biased MLE
    // covariance is exactly n·d — a closed-form invariant of the
    // quadratic form, so the per-row scores average to 2
    val m2s = Anomaly.mahalanobis2PerGroup(ridge, "grp", "x", "y")
      .agg(avg(col("m2"))).first().getDouble(0)
    assert(math.abs(m2s - 2.0) < 1e-6, s"mean m2 $m2s")
  }

  test("groups score independently") {
    val two = ridge.union(
      (1 to 30).map(i => ("h", 1000L + i, 5L * i + i % 4))
        .toDF("grp", "x", "y"))
    val byGroup = Anomaly.mahalanobis2PerGroup(two, "grp", "x", "y")
      .groupBy("grp").agg(avg(col("m2")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(byGroup("g") - 2.0) < 1e-6)
    assert(math.abs(byGroup("h") - 2.0) < 1e-6)
  }

  test("singular covariance yields null scores, not a crash") {
    // perfectly collinear: det = 0
    val flat = (1 to 10).map(i => ("s", i.toLong, 2L * i))
      .toDF("grp", "x", "y")
    val out = Anomaly.mahalanobis2PerGroup(flat, "grp", "x", "y")
    assert(out.filter(col("m2").isNotNull).count() == 0)
    assert(out.count() == 10)
  }

  test("half-space mass: the planted outlier owns the sparsest leaves") {
    // a tight cluster at (10, 20, 30) with one far-away point
    val pts = ((1 to 100).map(i =>
      (i.toString, 10L + i % 3, 20L + (i * 7) % 4, 30L + i % 5)) :+
      ("999", 500L, 900L, 700L)).toDF("id", "x0", "x1", "x2")
    val top = graft.ops.Anomaly.halfSpaceMass(
      pts, "id", Seq("x0", "x1", "x2"), depth = 6, topK = 3).collect()
    assert(top.head.getString(0) == "999",
      s"top anomaly ${top.head.getString(0)}")
    // every row counts itself in every tree's leaf: score >= trees
    top.foreach(r => assert(r.getLong(r.fieldIndex("score")) >= 3))
  }

  test("half-space mass is layout-independent") {
    val pts = (1 to 80).map(i =>
      (i.toString, i.toLong, (i * 13 % 29).toLong, (i * 7 % 17).toLong))
      .toDF("id", "x0", "x1", "x2")
    val a = graft.ops.Anomaly.halfSpaceMass(
      pts.repartition(1), "id", Seq("x0", "x1", "x2"), topK = 10)
      .collect().map(_.toSeq)
    val b = graft.ops.Anomaly.halfSpaceMass(
      pts.repartition(7), "id", Seq("x0", "x1", "x2"), topK = 10)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("pca2: a pure ridge puts all variance on the ridge direction") {
    // points on y = 2x: e1 = (1,2)/sqrt(5), l2 = 0, evr = 1
    val ridge2 = Seq(("g", 0L, 0L), ("g", 1L, 2L), ("g", 2L, 4L),
      ("g", 3L, 6L)).toDF("grp", "x", "y")
    val r = graft.ops.Anomaly.pca2PerGroup(ridge2, "grp", "x", "y")
      .first()
    assert(math.abs(r.getAs[Double]("l1") - 6.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("l2")) < 1e-12)
    assert(math.abs(r.getAs[Double]("evr") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e1x") - 1.0 / math.sqrt(5)) < 1e-12)
    assert(math.abs(r.getAs[Double]("e1y") - 2.0 / math.sqrt(5)) < 1e-12)
    // projection audit: sum of integer-rounded p1^2 ~ n*l1, p2 exactly 0
    assert(math.abs(r.getAs[Double]("p1sq_sum") - 4 * 6.25) <= 2.0)
    assert(r.getAs[Double]("p2sq_sum") == 0.0)
  }

  test("pca2: zero covariance takes the axis-aligned branch") {
    val square = Seq(("g", 0L, 0L), ("g", 2L, 2L), ("g", 0L, 2L),
      ("g", 2L, 0L), ("g", 1L, 1L)).toDF("grp", "x", "y")
    val r = graft.ops.Anomaly.pca2PerGroup(square, "grp", "x", "y")
      .first()
    assert(r.getAs[Double]("e1x") == 1.0 && r.getAs[Double]("e1y") == 0.0)
    assert(math.abs(r.getAs[Double]("evr") - 0.5) < 1e-12)
  }

  test("pca2: the principal direction is sign-canonical (e1x >= 0)") {
    // a DOWNWARD ridge y = -2x would naively give e1 = (c, ...) with
    // negative first component; canonicalization flips it
    val down = Seq(("g", 0L, 0L), ("g", 1L, -2L), ("g", 2L, -4L),
      ("g", 3L, -6L)).toDF("grp", "x", "y")
    val r = graft.ops.Anomaly.pca2PerGroup(down, "grp", "x", "y").first()
    assert(r.getAs[Double]("e1x") > 0)
    assert(math.abs(r.getAs[Double]("e1y") + 2.0 / math.sqrt(5)) < 1e-12)
  }

  test("olsPerGroup recovers an exact line and flags degenerate x") {
    // g1: exact y = 2x + 3 → slope 2, intercept 3, r² 1, resvar 0;
    // g2: constant x → vx = 0 → all fit columns null
    val rows = (Seq.tabulate(10)(i => ("g1", i.toLong, 2L * i + 3)) ++
      Seq(("g2", 5L, 1L), ("g2", 5L, 9L))).toDF("grp", "x", "y")
    val out = Anomaly.olsPerGroup(rows, "grp", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getLong(1) == 10L)
    assert(math.abs(g1.getDouble(2) - 2.0) < 1e-9, "slope")
    assert(math.abs(g1.getDouble(3) - 3.0) < 1e-9, "intercept")
    assert(math.abs(g1.getDouble(4) - 1.0) < 1e-9, "r2")
    assert(math.abs(g1.getDouble(5)) < 1e-9, "resvar")
    val g2 = out("g2")
    assert(g2.isNullAt(2) && g2.isNullAt(3) && g2.isNullAt(4) &&
      g2.isNullAt(5), "degenerate group must yield null fit")
  }

  test("olsPerGroup noisy fit matches the normal-equation solution") {
    // y = 7x - 4 with a deterministic ±5 perturbation pattern
    val pts = Seq.tabulate(25)(i =>
      ("g", i.toLong, 7L * i - 4 + (i % 5) - 2))
    val rows = pts.toDF("grp", "x", "y")
    val n = pts.size.toDouble
    val sx = pts.map(_._2.toDouble).sum
    val sy = pts.map(_._3.toDouble).sum
    val sxx = pts.map(p => p._2.toDouble * p._2).sum
    val sxy = pts.map(p => p._2.toDouble * p._3).sum
    val wantSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val wantIcept = sy / n - wantSlope * (sx / n)
    val r = Anomaly.olsPerGroup(rows, "grp", "x", "y").first()
    assert(math.abs(r.getDouble(2) - wantSlope) < 1e-6,
      s"slope ${r.getDouble(2)} vs $wantSlope")
    assert(math.abs(r.getDouble(3) - wantIcept) < 1e-6,
      s"intercept ${r.getDouble(3)} vs $wantIcept")
    assert(r.getDouble(4) > 0.99 && r.getDouble(4) < 1.0, "r2 near 1")
    assert(r.getDouble(5) > 0.0, "nonzero residual variance")
  }

  test("null feature rows are excluded from stats and output") {
    val withNulls = ridge.union(Seq(("g", null.asInstanceOf[java.lang.Long],
      java.lang.Long.valueOf(5L))).toDF("grp", "x", "y"))
    val out = Anomaly.mahalanobis2PerGroup(withNulls, "grp", "x", "y")
    assert(out.count() == 42) // the null-x row dropped
  }

  // exact plane y = 2*x1 + 3*x2 + 1 on four non-collinear points
  lazy val plane = Seq(("g", 1L, 0L, 3L), ("g", 0L, 1L, 4L),
    ("g", 1L, 1L, 6L), ("g", 2L, 1L, 8L)).toDF("grp", "x1", "x2", "y")

  test("ridge2: lambda = 0 recovers the exact OLS plane") {
    val r = Anomaly.ridge2PerGroup(plane, "grp", "x1", "x2", "y",
      lambda = 0.0).head()
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("b1") - 2.0) < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("b2") - 3.0) < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("b0") - 1.0) < 1e-9, r.toString)
  }

  test("ridge2: the penalty shrinks slopes toward zero") {
    val r = Anomaly.ridge2PerGroup(plane, "grp", "x1", "x2", "y",
      lambda = 1.5).head()
    val (b1, b2) = (r.getAs[Double]("b1"), r.getAs[Double]("b2"))
    assert(b1 > 0.0 && b1 < 2.0, s"b1 shrunk: $b1")
    assert(b2 > 0.0 && b2 < 3.0, s"b2 shrunk: $b2")
  }

  test("ridge2: constant feature at lambda = 0 nulls out, " +
       "lambda > 0 regularizes it") {
    val degen = Seq(("g", 5L, 0L, 3L), ("g", 5L, 1L, 4L),
      ("g", 5L, 2L, 5L)).toDF("grp", "x1", "x2", "y")
    val r0 = Anomaly.ridge2PerGroup(degen, "grp", "x1", "x2", "y",
      lambda = 0.0).head()
    assert(r0.isNullAt(r0.fieldIndex("b1")), r0.toString)
    val r1 = Anomaly.ridge2PerGroup(degen, "grp", "x1", "x2", "y",
      lambda = 10.0).head()
    assert(!r1.isNullAt(r1.fieldIndex("b1")), r1.toString)
  }
}
