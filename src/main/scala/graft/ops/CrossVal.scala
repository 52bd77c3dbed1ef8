package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-validation and per-row influence for the closed-form ridge
  * family — the model-SELECTION discipline the reference applies through
  * sklearn's split/score loop (`FD/model.py:96-117` trains on one fixed
  * split and compares models on held-out metrics), rebuilt as exact
  * distributed algebra so the whole protocol sits on the hash oracle.
  *
  * Two design points that matter at 100 TB:
  *
  *   - **k-fold CV in ONE data pass, not k.** The naive protocol refits
  *     k times, each fit scanning (k−1)/k of the corpus — Θ(k) full
  *     scans. But a closed-form ridge fit is a function of nine moment
  *     sums, and sums are fold-decomposable: aggregate the nine sums
  *     PER FOLD (one map-side-combined pass, k output rows), then each
  *     fold's training sums are `total − fold` by subtraction on exact
  *     decimals. Every fold's coefficients come out of one k-row frame;
  *     a second scan-local pass scores each row against its own fold's
  *     complement model (broadcast join on the k-row model frame). Two
  *     scans total, independent of k.
  *
  *   - **Leave-one-out without n refits.** For ridge with unpenalized
  *     intercept the hat diagonal is closed-form — h_i = 1/n + ũ'A⁻¹ũ
  *     with A the λ-shifted centered 2×2 Gram and ũ the row's centered
  *     features — so the exact LOO residual e_i/(1−h_i) and a Cook-style
  *     influence score h·e²/(1−h)² are per-row expressions over ONE
  *     broadcast stats row. That per-row "how much does this example
  *     steer the fit" signal is the data-valuation primitive a curation
  *     pipeline prunes label noise with (top-|influence| rows are the
  *     mislabeled/outlier candidates worth auditing first).
  *
  * Fold assignment is the [[Sampling]] portable-hash discipline: fold =
  * (first md5 hex digit of `"cv:" || id`) mod k — rerun-, layout- and
  * engine-stable, so the folds a model was selected on can be
  * reconstructed years later by any engine with md5. k must divide 16
  * so the digit→fold map is exactly uniform over hash space (no modulo
  * bias); k=4 is the suite default.
  *
  * Exactness: the nine raw moments accumulate as DECIMAL(38,0)
  * (integer-valued inputs — cents, counts; the [[Anomaly.ridge2PerGroup]]
  * contract), complements are decimal subtraction, the 2×2 solve is the
  * m24 double chain with 7dp-rounded coefficients. Residuals are then
  * EXACT 7dp decimals (7dp coefficients × integer features, every
  * partial sum ≤ 2⁵³ in scaled units), so squared errors are summed as
  * exact DECIMAL(28,14) — order-free — and only the final mse/influence
  * divisions are derived doubles (2dp-rounded, never sitting on a
  * representable half-boundary).
  */
object CrossVal {

  private val dec38 = "decimal(38,0)"

  /** Portable deterministic fold id in [0, k): first md5 hex digit of
    * `"cv:" || id` mod k. Any engine restates it; k | 16 keeps the
    * digit→fold map bias-free.
    */
  def foldOf(id: Column, k: Int): Column = {
    require(k >= 2 && 16 % k == 0, s"k must divide 16, got $k")
    (conv(substring(md5(concat(lit("cv:"), id.cast("string"))
      .cast("binary")), 1, 1), 16, 10).cast("int") % k)
  }

  /** Nine-moment frame keyed by `__fold` plus the grand-total columns
    * (broadcast-joined) — the single aggregation both passes reuse.
    */
  private def foldSums(rows: DataFrame): DataFrame = {
    val x1 = col("__x1").cast(dec38)
    val x2 = col("__x2").cast(dec38)
    val y = col("__y").cast(dec38)
    val pf = rows.groupBy(col("__fold"))
      .agg(count(lit(1)).as("__n"),
        sum(x1).as("__s1"), sum(x2).as("__s2"), sum(y).as("__sy"),
        sum(x1 * x1).as("__s11"), sum(x2 * x2).as("__s22"),
        sum(x1 * x2).as("__s12"),
        sum(x1 * y).as("__s1y"), sum(x2 * y).as("__s2y"))
    val tot = pf.agg(sum("__n").as("__tn"),
      sum("__s1").as("__t1"), sum("__s2").as("__t2"),
      sum("__sy").as("__ty"),
      sum("__s11").as("__t11"), sum("__s22").as("__t22"),
      sum("__s12").as("__t12"),
      sum("__s1y").as("__t1y"), sum("__s2y").as("__t2y"))
    pf.crossJoin(broadcast(tot))
  }

  /** The m24 centered-sums → 2×2 solve chain over columns named by
    * `pre` (sum prefix) and `nCol`, appending 7dp-rounded `b1/b2/b0`.
    * Shared by the complement (CV) and global (LOO) fits.
    */
  private def solveRidge2(df: DataFrame, nCol: String, s1: String,
                          s2: String, sy: String, s11: String,
                          s22: String, s12: String, s1y: String,
                          s2y: String, lambda: Double): DataFrame = {
    val nd = col(nCol).cast("double")
    def c(sab: String, sa: String, sb: String) =
      col(sab).cast("double") -
        col(sa).cast("double") * col(sb).cast("double") / nd
    df.withColumn("__c11", c(s11, s1, s1))
      .withColumn("__c22", c(s22, s2, s2))
      .withColumn("__c12", c(s12, s1, s2))
      .withColumn("__c1y", c(s1y, s1, sy))
      .withColumn("__c2y", c(s2y, s2, sy))
      .withColumn("__det",
        (col("__c11") + lambda) * (col("__c22") + lambda) -
          col("__c12") * col("__c12"))
      .withColumn("__b1", round(when(col("__det") > 0.0,
        ((col("__c22") + lambda) * col("__c1y") -
          col("__c12") * col("__c2y")) / col("__det")), 7))
      .withColumn("__b2", round(when(col("__det") > 0.0,
        ((col("__c11") + lambda) * col("__c2y") -
          col("__c12") * col("__c1y")) / col("__det")), 7))
      .withColumn("__b0", round(when(col("__det") > 0.0,
        col(sy).cast("double") / nd -
          col("__b1") * (col(s1).cast("double") / nd) -
          col("__b2") * (col(s2).cast("double") / nd)), 7))
  }

  private def inputRows(df: DataFrame, idCol: String, x1Col: String,
                        x2Col: String, yCol: String, k: Int): DataFrame =
    df.filter(col(x1Col).isNotNull && col(x2Col).isNotNull &&
        col(yCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"),
        col(x1Col).cast("long").as("__x1"),
        col(x2Col).cast("long").as("__x2"),
        col(yCol).cast("long").as("__y"))
      .withColumn("__fold", foldOf(col("__id"), k))

  /** Single-pass k-fold cross-validated two-feature ridge: per fold,
    * the coefficients fitted on the OTHER k−1 folds (complement sums)
    * and the held-out mean squared error.
    *
    * Output per fold: `(fold, n_train, n_test, b1, b2, b0, mse)`,
    * ordered by fold. Inputs must be integer-valued (cents, counts).
    *
    * Scale shape: one 9-sum grouped aggregation (map-side combined, k
    * output rows), algebra on the k-row frame, then one scan-local
    * scoring pass against the broadcast k-row model frame — two scans
    * total regardless of k, nothing per-row shuffles.
    */
  def kFoldRidge2(df: DataFrame, idCol: String, x1Col: String,
                  x2Col: String, yCol: String, k: Int = 4,
                  lambda: Double = 0.0): DataFrame = {
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val rows = inputRows(df, idCol, x1Col, x2Col, yCol, k)
    val withTot = foldSums(rows)
    // training sums for fold f = grand total − fold f's sums
    val comp = withTot.select(col("__fold"),
      col("__n").as("__n_test"),
      (col("__tn") - col("__n")).as("__ntr"),
      (col("__t1") - col("__s1")).as("__cs1"),
      (col("__t2") - col("__s2")).as("__cs2"),
      (col("__ty") - col("__sy")).as("__csy"),
      (col("__t11") - col("__s11")).as("__cs11"),
      (col("__t22") - col("__s22")).as("__cs22"),
      (col("__t12") - col("__s12")).as("__cs12"),
      (col("__t1y") - col("__s1y")).as("__cs1y"),
      (col("__t2y") - col("__s2y")).as("__cs2y"))
    val models = solveRidge2(comp, "__ntr", "__cs1", "__cs2", "__csy",
      "__cs11", "__cs22", "__cs12", "__cs1y", "__cs2y", lambda)
      .select(col("__fold"), col("__n_test"), col("__ntr"),
        col("__b1"), col("__b2"), col("__b0"))
    // held-out scoring: e is an EXACT 7dp decimal (7dp b's × integer
    // x's, all partial sums double-exact), so square/sum in decimal.
    // Width 18,7 (not the oracle's 19,7): e² must stay a FULL-scale
    // decimal(≤38,14) for 14dp exactness, and 19,7 squared is
    // precision 39 → Spark shaves the scale to 13 and rounds. 18,7
    // keeps the product exact at decimal(37,14) with |e| < 10^11
    // headroom — any wider residual overflows both engines alike.
    val scored = rows
      .join(broadcast(models.select(col("__fold"), col("__b1"),
        col("__b2"), col("__b0"))), Seq("__fold"))
      .withColumn("__e", (col("__y").cast("double") -
        (col("__b0") + col("__b1") * col("__x1").cast("double") +
          col("__b2") * col("__x2").cast("double"))).cast("decimal(18,7)"))
      .groupBy(col("__fold"))
      .agg(sum(col("__e") * col("__e")).as("__ssq"))
    models.join(scored, Seq("__fold"))
      .select(col("__fold").as("fold"),
        col("__ntr").cast("long").as("n_train"),
        col("__n_test").cast("long").as("n_test"),
        col("__b1").as("b1"), col("__b2").as("b2"), col("__b0").as("b0"),
        round(col("__ssq").cast("double") /
          col("__n_test").cast("double"), 2).as("mse"))
      .orderBy(col("fold"))
  }

  /** Exact leave-one-out influence under the global two-feature ridge
    * fit: per row, the residual `e` (an exact 7dp decimal), the ridge
    * hat leverage `h = 1/n + ũ'(C+λI)⁻¹ũ`, the exact LOO residual
    * `e/(1−h)`, and the Cook-style influence `h·e²/(1−h)²` — returning
    * the `topK` highest-influence rows (ties broken on id), the audit
    * frontier a curation pass reads first.
    *
    * Scale shape: one 9-sum aggregation → ONE broadcast stats row →
    * scan-local per-row algebra → TakeOrdered top-k. No refits, no
    * shuffle beyond the k-row ordered frontier.
    */
  def looInfluenceRidge2(df: DataFrame, idCol: String, x1Col: String,
                         x2Col: String, yCol: String,
                         lambda: Double = 0.0,
                         topK: Int = 20): DataFrame = {
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val rows = inputRows(df, idCol, x1Col, x2Col, yCol, k = 2)
      .drop("__fold")
    val x1 = col("__x1").cast(dec38)
    val x2 = col("__x2").cast(dec38)
    val y = col("__y").cast(dec38)
    val st = rows.agg(count(lit(1)).as("__n"),
      sum(x1).as("__s1"), sum(x2).as("__s2"), sum(y).as("__sy"),
      sum(x1 * x1).as("__s11"), sum(x2 * x2).as("__s22"),
      sum(x1 * x2).as("__s12"),
      sum(x1 * y).as("__s1y"), sum(x2 * y).as("__s2y"))
    val m = solveRidge2(st, "__n", "__s1", "__s2", "__sy",
      "__s11", "__s22", "__s12", "__s1y", "__s2y", lambda)
      .select(col("__n"), col("__det"), col("__c11"), col("__c22"),
        col("__c12"), col("__b1"), col("__b2"), col("__b0"),
        (col("__s1").cast("double") / col("__n").cast("double"))
          .as("__xb1"),
        (col("__s2").cast("double") / col("__n").cast("double"))
          .as("__xb2"))
    val nd = col("__n").cast("double")
    val u1 = col("__x1").cast("double") - col("__xb1")
    val u2 = col("__x2").cast("double") - col("__xb2")
    // (C+λI)⁻¹ quadratic form, spelled over the centered sums so the
    // oracle replays it term-for-term
    val quad = (u1 * u1 * (col("__c22") + lambda) -
      lit(2.0) * u1 * u2 * col("__c12") +
      u2 * u2 * (col("__c11") + lambda)) / col("__det")
    val h = round(lit(1.0) / nd + quad, 7)
    val e = (col("__y").cast("double") -
      (col("__b0") + col("__b1") * col("__x1").cast("double") +
        col("__b2") * col("__x2").cast("double")))
    rows.crossJoin(broadcast(m))
      .filter(col("__det") > 0.0)
      .withColumn("__h", h)
      .withColumn("__e", round(e, 7))
      .withColumn("__loo",
        round(col("__e") / (lit(1.0) - col("__h")), 2))
      .withColumn("__infl",
        round(col("__h") * col("__e") * col("__e") /
          ((lit(1.0) - col("__h")) * (lit(1.0) - col("__h"))), 2))
      .select(col("__id").as("id"), col("__e").as("resid"),
        col("__h").as("leverage"), col("__loo").as("loo_resid"),
        col("__infl").as("influence"))
      .orderBy(col("influence").desc, col("id").asc)
      .limit(topK)
  }
}
