package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Logistic regression trained by IRLS (iteratively reweighted least
  * squares / Newton–Raphson) as PURE DataFrame algebra — the second
  * fully oracle-checked TRAINED model after [[graft.ops.NaiveBayes]],
  * and the model the reference actually serves (`FD/model.py:119` fits
  * sklearn's LogisticRegression; sklearn's solver and this Newton path
  * target the same MLE, and the per-iteration algebra here is the
  * textbook IRLS step).
  *
  * Per iteration, over features (1, x1, x2):
  *   z = b0 + b1·x1 + b2·x2          (strict left-to-right)
  *   p = round(sigmoid(z), 7)         (the m15 discipline: ONE
  *                                     transcendental per row, rounded
  *                                     — 7dp leaves ~1e9× margin
  *                                     between an engine's 1-ulp exp
  *                                     drift and the rounding boundary)
  *   w = p(1−p)
  *   gradient  g_j  = Σ (y−p)·x_j     (3 sums)
  *   Hessian   H_jk = Σ w·x_j·x_k     (6 sums, symmetric)
  *   δ = H⁻¹g by Cramer's rule        (fixed-order double arithmetic)
  *   β' = round(β + δ, 9)
  *
  * Every per-row term is 9dp-rounded then summed in DECIMAL(30,9), so
  * the sums are EXACT and order-independent — the property that makes
  * a trained model hash-comparable across engines (double addition
  * order would otherwise smear last bits across partitions). The β
  * frame is ONE ROW and rides the plan as a broadcast cross join;
  * nothing ever collects to the driver, so the shape at 100 TB is
  * `iterations` scans each folding to 12 numbers per partition —
  * exactly how a distributed Newton step is meant to run.
  *
  * Scope: 2 features + intercept (Cramer for d=3). More features wants
  * an LU solve over the d×d Hessian — a d²-bounded collect,
  * deliberately out of scope while the point is a hash-exact oracle.
  */
object LogisticIrls {

  private def d9(c: Column): Column = round(c, 9).cast(DecimalType(30, 9))

  /** First-row cofactor expansion of a 3×3, with the EXACT grouping
    * ((t1 − t2) + t3) the oracle restates term for term.
    */
  private def det3(m00: Column, m01: Column, m02: Column,
                   m10: Column, m11: Column, m12: Column,
                   m20: Column, m21: Column, m22: Column): Column =
    m00 * (m11 * m22 - m12 * m21) -
      m01 * (m10 * m22 - m12 * m20) +
      m02 * (m10 * m21 - m11 * m20)

  /** One-row frame (b0, b1, b2) after `iterations` Newton steps from
    * β = 0. `labelCol` must be 0/1.
    *
    * Degenerate designs (collinear or constant features) make the
    * Hessian singular: Cramer then divides by a zero determinant and
    * the coefficients come back NaN — deterministically on both
    * engines (IEEE 0/0), never an exception. Callers owning messy
    * feature spaces should de-duplicate/center features first; the
    * NaN row is the documented signal, not a crash. Rows with a null
    * label or feature are DROPPED up front (the Anomaly/Stump/Conformal
    * convention) — without the filter, sum() would silently skip their
    * null terms while count() still counted them, so `n` and the
    * moment sums would describe two different populations.
    */
  def train(df: DataFrame, labelCol: String, x1Col: String, x2Col: String,
            iterations: Int = 3): DataFrame =
    trainOn(baseOf(df, labelCol, x1Col, x2Col), iterations)

  /** The Newton loop over an already-projected (y, x1, x2) frame —
    * persisted here because every iteration is a full pass over it
    * (iteration k's broadcast beta subtree chains iterations 1..k−1,
    * so an unpersisted base re-reads the source per pass; the r13
    * forced-action bench measured the 3-iteration chain + summary at
    * 4 unshared corpus scans).
    */
  private def trainOn(base0: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "at least one Newton step")
    val base = base0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var beta = base.sparkSession.range(1).select(
      lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"))
    for (_ <- 1 to iterations) beta = step(base, beta)
    beta
  }

  /** Shared train/score projection: one row set for n AND the sums. */
  private def baseOf(df: DataFrame, labelCol: String, x1Col: String,
                     x2Col: String): DataFrame =
    df.filter(col(labelCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .select(
        col(labelCol).cast("double").as("y"),
        col(x1Col).cast("double").as("x1"),
        col(x2Col).cast("double").as("x2"))

  private def sigmoid(z: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-z)), 7)

  private def zOf: Column =
    col("b0") + col("b1") * col("x1") + col("b2") * col("x2")

  private def step(base: DataFrame, beta: DataFrame): DataFrame = {
    // p/w/r materialize in a PROJECTION below the agg: each sum(...)
    // is its own aggregate function and common-subexpression
    // elimination does not cross them, so referencing sigmoid(z)
    // inside all twelve terms evaluated exp() twelve times per row
    // (r13 forced-bench finding)
    val joined = base.crossJoin(broadcast(beta))
      .withColumn("__p", sigmoid(zOf))
      .withColumn("__w", col("__p") * (lit(1.0) - col("__p")))
      .withColumn("__r", col("y") - col("__p"))
    val w = col("__w")
    val r = col("__r")
    val agg = joined.agg(
      // β is constant over the frame; max() carries it through the agg
      max(col("b0")).as("pb0"), max(col("b1")).as("pb1"),
      max(col("b2")).as("pb2"),
      sum(d9(r)).as("g0"),
      sum(d9(r * col("x1"))).as("g1"),
      sum(d9(r * col("x2"))).as("g2"),
      sum(d9(w)).as("h00"),
      sum(d9(w * col("x1"))).as("h01"),
      sum(d9(w * col("x2"))).as("h02"),
      sum(d9(w * col("x1") * col("x1"))).as("h11"),
      sum(d9(w * col("x1") * col("x2"))).as("h12"),
      sum(d9(w * col("x2") * col("x2"))).as("h22"))
    def D(n: String): Column = col(n).cast("double")
    val (g0, g1, g2) = (D("g0"), D("g1"), D("g2"))
    val (h00, h01, h02) = (D("h00"), D("h01"), D("h02"))
    val (h11, h12, h22) = (D("h11"), D("h12"), D("h22"))
    val det = det3(h00, h01, h02, h01, h11, h12, h02, h12, h22)
    val det0 = det3(g0, h01, h02, g1, h11, h12, g2, h12, h22)
    val det1 = det3(h00, g0, h02, h01, g1, h12, h02, g2, h22)
    val det2 = det3(h00, h01, g0, h01, h11, g1, h02, h12, g2)
    agg.select(
      round(col("pb0") + det0 / det, 9).as("b0"),
      round(col("pb1") + det1 / det, 9).as("b1"),
      round(col("pb2") + det2 / det, 9).as("b2"))
  }

  /** Score ANY frame with a trained one-row β frame — the serving
    * path, kept as plan algebra (broadcast cross join, no collect) so
    * train → persist β → score new micro-batches composes without the
    * coefficients ever leaving the cluster. Appends `proba` (rounded
    * sigmoid, the training discipline) and `pred` (0.5 threshold).
    */
  def predict(df: DataFrame, beta: DataFrame,
              x1Col: String, x2Col: String,
              probaCol: String = "proba",
              predCol: String = "pred"): DataFrame = {
    val z = col("b0") + col("b1") * col(x1Col).cast("double") +
      col("b2") * col(x2Col).cast("double")
    df.crossJoin(broadcast(beta))
      .withColumn(probaCol, sigmoid(z))
      .withColumn(predCol, (col(probaCol) >= 0.5).cast("int"))
      .drop("b0", "b1", "b2")
  }

  /** Train, then score the same frame with the final β: one row —
    * the 9dp coefficients, row count, positive predictions at the 0.5
    * threshold, and the exact-decimal sum of the rounded probabilities
    * (the all-in-one hash gate for train AND serve).
    */
  def trainSummary(df: DataFrame, labelCol: String, x1Col: String,
                   x2Col: String, iterations: Int = 3): DataFrame = {
    // ONE projected frame for the Newton loop AND the scoring pass —
    // trainOn persists it, so the summary reads the cache
    val base = baseOf(df, labelCol, x1Col, x2Col)
    val beta = trainOn(base, iterations)
    val p = sigmoid(zOf)
    base.crossJoin(broadcast(beta))
      .agg(
        max(col("b0")).as("b0"), max(col("b1")).as("b1"),
        max(col("b2")).as("b2"),
        count(lit(1)).as("n"),
        sum(when(p >= 0.5, 1L).otherwise(0L)).as("n_pred_pos"),
        sum(d9(p)).cast("double").as("proba_sum"))
  }

  /** PLATT SCALING (Platt 1999): the 1-feature logistic
    * p = σ(a + b·score) fitted by the same IRLS discipline as
    * [[train]], reduced to the 2×2 normal equations — the parametric
    * calibration map that turns any raw score (a margin, a distance, a
    * heuristic) into a probability, completing the calibration family
    * next to the isotonic (PAV) and conformal forms. Same exactness
    * contract: 7dp sigmoids, 9dp DECIMAL(30,9) gradient/Hessian sums
    * (order-free), Cramer solve as one fixed-grouping double chain,
    * 9dp coefficients per step. A constant score makes the Hessian
    * determinant EXACTLY zero → null coefficients (ANSI forbids the
    * IEEE 0/0 the [[train]] near-singular float regime produces).
    */
  def trainPlatt(df: DataFrame, labelCol: String, scoreCol: String,
                 iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "at least one Newton step")
    val base = base1Of(df, labelCol, scoreCol)
    var beta = df.sparkSession.range(1).select(
      lit(0.0).as("a"), lit(0.0).as("b"))
    for (_ <- 1 to iterations) beta = step1(base, beta)
    beta
  }

  private def base1Of(df: DataFrame, labelCol: String,
                      scoreCol: String): DataFrame =
    df.filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(labelCol).cast("double").as("y"),
        col(scoreCol).cast("double").as("x"))

  private def z1Of: Column = col("a") + col("b") * col("x")

  private def step1(base: DataFrame, beta: DataFrame): DataFrame = {
    // the step() stance: one sigmoid per row via a projection
    val joined = base.crossJoin(broadcast(beta))
      .withColumn("__p", sigmoid(z1Of))
      .withColumn("__w", col("__p") * (lit(1.0) - col("__p")))
      .withColumn("__r", col("y") - col("__p"))
    val w = col("__w")
    val r = col("__r")
    val agg = joined.agg(
      max(col("a")).as("pa"), max(col("b")).as("pb"),
      sum(d9(r)).as("g0"),
      sum(d9(r * col("x"))).as("g1"),
      sum(d9(w)).as("h00"),
      sum(d9(w * col("x"))).as("h01"),
      sum(d9(w * col("x") * col("x"))).as("h11"))
    def D(n: String): Column = col(n).cast("double")
    val (g0, g1) = (D("g0"), D("g1"))
    val (h00, h01, h11) = (D("h00"), D("h01"), D("h11"))
    val det = h00 * h11 - h01 * h01
    val da = g0 * h11 - h01 * g1
    val db = h00 * g1 - h01 * g0
    // a constant score makes det EXACTLY zero (h01 = c·h00, h11 =
    // c²·h00) and ANSI mode hard-fails double/0 — null coefficients
    // are the degenerate signal here (the train() NaN note applies to
    // the NEAR-singular float regime, which divides fine)
    agg.select(
      when(det =!= 0.0, round(col("pa") + da / det, 9)).as("a"),
      when(det =!= 0.0, round(col("pb") + db / det, 9)).as("b"))
  }

  /** Train the Platt map, then score the same frame: one row —
    * 9dp (a, b), row count, positives at the 0.5 threshold, and the
    * exact-decimal sum of the rounded calibrated probabilities (the
    * [[trainSummary]] hash gate, 1-feature form).
    */
  def plattSummary(df: DataFrame, labelCol: String, scoreCol: String,
                   iterations: Int = 3): DataFrame = {
    val beta = trainPlatt(df, labelCol, scoreCol, iterations)
    val base = base1Of(df, labelCol, scoreCol)
    val p = sigmoid(z1Of)
    base.crossJoin(broadcast(beta))
      .agg(
        max(col("a")).as("a"), max(col("b")).as("b"),
        count(lit(1)).as("n"),
        sum(when(p >= 0.5, 1L).otherwise(0L)).as("n_pred_pos"),
        sum(d9(p)).cast("double").as("proba_sum"))
  }
}
