package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exactly-trained GRADIENT-BOOSTED STUMPS with logistic loss — the
  * XGBoost exact-greedy algorithm (Chen & Guestrin 2016, Alg. 1) at
  * depth 1: per round, per-row gradients g = p − y and hessians
  * h = p(1−p) from the current margin, the split maximizing
  *   gain = GL²/(HL+λ) + GR²/(HR+λ) − G²/(H+λ)
  * across every distinct-value threshold of every candidate feature,
  * and leaf weights w = −G_side/(H_side+λ) stepped with learning rate
  * `lr`. The reference trains this family through xgboost
  * (reference `FD/model.py:119,190-192` — unavailable offline, the
  * engine's one documented substitution); this op pins the BOOSTING
  * ARITHMETIC itself on the oracle, next to [[Stump]] (the Gini
  * split), [[graft.ml.LogisticIrls]] (Newton) and [[NaiveBayes]].
  *
  * Exactness discipline (the m16 rules): the corpus collapses to the
  * (features → cnt, pos) histogram, so the margin — a function of the
  * split path, hence of the feature vector — lives per CELL, not per
  * row. p = round(sigmoid(margin), 7); per-cell g/h are 9dp-rounded
  * into DECIMAL(30,9) before any cross-cell sum (order-free, exact);
  * gain and weights are fixed-order double chains rounded to 9dp
  * BEFORE the argmax, tie-broken on (feature, threshold); the margin
  * is re-rounded to 9dp after every additive step; the per-round
  * training confusion uses `margin >= 0` (≡ p ≥ ½ by monotonicity —
  * integer-exact, no transcendental near the decision boundary).
  *
  * Scale shape: one map-side-combinable histogram aggregation over
  * the corpus, then every round is algebra on the persisted histogram
  * (cost bounded by the feature-cardinality product, not rows) with
  * prefix sums via [[Aggregates.bucketedPrefixSums]] — no global
  * window. The `rounds` driver round-trips (one 1-row best-split
  * collect each) are inherent to sequential boosting, the
  * kCenterCoreset precedent. Decimal↔double casts stay exact while
  * |Σg|·10⁹ < 2⁵³ (corpus ≲ 9·10⁶ rows per cell-sum unit) — the
  * shared bucketedPrefixSums magnitude bound, documented there.
  *
  * Output: one row per boosting round — `round`, `feat`, `threshold`
  * (split is `feat <= threshold`), `gain`, `w_left`, `w_right`, and
  * the post-update training confusion `tp/fp/fn/tn` + `acc`.
  */
object Boost {

  final case class Split(feat: String, threshold: Long,
                         gain: Double, wLeft: Double, wRight: Double)

  def trainStumps(df: DataFrame, labelCol: String, features: Seq[String],
                  rounds: Int = 3, lr: Double = 0.3,
                  lambda: Double = 1.0): DataFrame =
    trainStumpsCached(df, labelCol, features, rounds, lr, lambda).df

  /** [[trainStumps]] with the cell histogram persisted (every round's
    * split search and confusion read it) and handed back for release.
    */
  def trainStumpsCached(df: DataFrame, labelCol: String,
                        features: Seq[String], rounds: Int = 3,
                        lr: Double = 0.3, lambda: Double = 1.0): Cached = {
    val (out, _, hist) = trainCore(df, labelCol, features, rounds, lr,
      lambda)
    Cached(out, Seq(hist))
  }

  /** EXACT SHAP attribution for the trained stump ensemble — per
    * feature, the mean signed and mean absolute Shapley value over the
    * training distribution, plus the feature's base contribution.
    *
    * For a depth-1 ensemble the model is ADDITIVE per feature —
    * f(x) = Σ_t f_t(x_{feat_t}) with no interactions — so the Shapley
    * value collapses to closed form (Lundberg & Lee 2017's additive
    * special case): φ_j(x) = Σ_{t: feat_t = j} (f_t(x) − E[f_t]), with
    * E over the training distribution. No sampling, no path
    * approximation — the attribution is exact and replayed by the
    * oracle from the same split/expectation literals.
    *
    * Output per feature: `(feat, base, mean_shap, mean_abs_shap)` —
    * `base` = Σ E[f_t] over the feature's stumps (the part of the
    * prediction the feature contributes before seeing x),
    * `mean_abs_shap` = the global importance ranking a feature audit
    * reads.
    *
    * Scale shape: training's histogram collapse does the corpus work;
    * attribution is per-CELL algebra over the persisted histogram
    * (one bounded aggregation per feature) + `rounds` 1-row
    * expectation collects — nothing re-scans the corpus.
    */
  def shapStumps(df: DataFrame, labelCol: String, features: Seq[String],
                 rounds: Int = 3, lr: Double = 0.3,
                 lambda: Double = 1.0): DataFrame =
    shapStumpsCached(df, labelCol, features, rounds, lr, lambda).df

  def shapStumpsCached(df: DataFrame, labelCol: String,
                       features: Seq[String], rounds: Int = 3,
                       lr: Double = 0.3, lambda: Double = 1.0): Cached = {
    val (_, splits, hist) = trainCore(df, labelCol, features, rounds, lr,
      lambda)
    // per-stump training expectation E[f_t] = lr·(nL·wL + nR·wR)/n —
    // one bounded collect per stump, the same double chain the oracle
    // restates (CAST AS DOUBLE before each product)
    val counts = splits.map { s =>
      val r = hist.agg(
        sum(when(col(s.feat) <= lit(s.threshold), col("cnt"))
          .otherwise(0L)).as("nl"),
        sum(col("cnt")).as("n")).first()
      (r.getLong(0), r.getLong(1))
    }
    val n = counts.headOption.map(_._2).getOrElse(0L)
    val exps = splits.zip(counts).map { case (s, (nl, nn)) =>
      lr * ((nl.toDouble * s.wLeft + (nn - nl).toDouble * s.wRight) /
        nn.toDouble)
    }
    def contrib(s: Split): Column =
      lit(lr) * when(col(s.feat) <= lit(s.threshold), lit(s.wLeft))
        .otherwise(lit(s.wRight))
    val perFeat = features.map { f =>
      // fixed round order with exact-zero terms for other features'
      // stumps (adding 0.0 is an IEEE identity, so the engine replay
      // that zero-fills per CASE lands on the same double)
      val phi = round(splits.zip(exps).foldLeft(lit(0.0)) {
        case (acc, (s, e)) =>
          if (s.feat == f) acc + (contrib(s) - lit(e)) else acc
      }, 7)
      val base = splits.zip(exps)
        .foldLeft(0.0)((a, se) => if (se._1.feat == f) a + se._2 else a)
      hist.agg(
          sum(col("cnt") * abs(phi).cast("decimal(11,7)")).as("__sa"),
          sum(col("cnt") * phi.cast("decimal(11,7)")).as("__ss"))
        .select(lit(f).as("feat"),
          round(lit(base), 7).as("base"),
          when(lit(n) > 0, round(col("__ss").cast("double") /
            lit(n).cast("double"), 7)).as("mean_shap"),
          when(lit(n) > 0, round(col("__sa").cast("double") /
            lit(n).cast("double"), 7)).as("mean_abs_shap"))
    }
    val out = perFeat.reduce(_ unionByName _)
      .orderBy(col("feat"))
    Cached(out, Seq(hist))
  }

  private def trainCore(df: DataFrame, labelCol: String,
                        features: Seq[String], rounds: Int,
                        lr: Double, lambda: Double)
      : (DataFrame, Vector[Split], DataFrame) = {
    require(features.nonEmpty && rounds >= 1, "need features and rounds")
    val notNull = (features :+ labelCol)
      .map(col(_).isNotNull).reduce(_ && _)
    val hist = df.filter(notNull)
      .groupBy(features.map(f => col(f).cast("long").as(f)): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hist.count() // eager pin: rounds+1 consumers, some under broadcasts

    // margin after the splits chosen so far, as a column over the
    // feature cells — rebuilt per round from collected literals
    def marginCol(splits: Seq[Split]): Column =
      splits.foldLeft(lit(0.0)) { (m, s) =>
        round(m + lit(lr) * when(col(s.feat) <= lit(s.threshold),
          lit(s.wLeft)).otherwise(lit(s.wRight)), 9)
      }

    def bestSplit(margin: Column): Option[Split] = {
      val cells = hist
        .withColumn("__p", round(lit(1.0) /
          (lit(1.0) + exp(-margin)), 7))
        .withColumn("__g", round(col("cnt") * col("__p") - col("pos"), 9)
          .cast("decimal(30,9)"))
        .withColumn("__h",
          round((col("cnt") * col("__p")) * (lit(1.0) - col("__p")), 9)
            .cast("decimal(30,9)"))
      val tot = cells.agg(sum(col("__g")).as("__tg"),
        sum(col("__h")).as("__th"), sum(col("cnt")).as("__tc"))
      val perFeat = features.map { f =>
        val grouped = cells.groupBy(col(f).as("__v"))
          .agg(sum(col("__g")).as("__fg"), sum(col("__h")).as("__fh"),
            sum(col("cnt")).as("__fc"))
        Aggregates.bucketedPrefixSums(grouped, "__v", ascending = true,
            sumCols = Seq("__fg", "__fh", "__fc"))
          .select(lit(f).as("__feat"), col("__v"),
            col("cum___fg").as("__gl"), col("cum___fh").as("__hl"),
            col("cum___fc").as("__cl"))
      }.reduce(_ unionByName _)
      val gl = col("__gl").cast("double")
      val hl = col("__hl").cast("double")
      val g = col("__tg").cast("double")
      val h = col("__th").cast("double")
      val gr = g - gl
      val hr = h - hl
      val lam = lit(lambda)
      val scored = perFeat.crossJoin(broadcast(tot))
        .filter(col("__cl") < col("__tc")) // max value: right side empty
        // gain rounds at 7dp, not the 9dp of g/h/weights: the gain is
        // a three-term double chain whose value can sit within an ulp
        // of a .5e-9 boundary, where Spark's exact BigDecimal HALF_UP
        // and DuckDB's scaled-multiply round() disagree (observed once
        // at sf0.001: 0.686135906 vs ...905). 7dp drops the boundary
        // probability 100× and is ample split-selection resolution.
        .withColumn("__gain", round((gl * gl) / (hl + lam)
          + (gr * gr) / (hr + lam) - (g * g) / (h + lam), 7))
        .withColumn("__wl", round(-gl / (hl + lam), 9))
        .withColumn("__wr", round(-gr / (hr + lam), 9))
        .agg(min_by(
          struct(col("__feat"), col("__v"), col("__gain"), col("__wl"),
            col("__wr")),
          struct(-col("__gain"), col("__feat"), col("__v"))).as("__b"))
        .filter(col("__b").isNotNull)
        .select(col("__b.__feat"), col("__b.__v"), col("__b.__gain"),
          col("__b.__wl"), col("__b.__wr"))
      scored.collect().headOption.map(r =>
        Split(r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
    }

    var splits = Vector.empty[Split]
    val roundFrames = (1 to rounds).flatMap { t =>
      bestSplit(marginCol(splits)).map { s =>
        splits = splits :+ s
        val m = marginCol(splits)
        // post-update training confusion: pred = margin >= 0 (≡ p ≥ ½)
        val n = col("tp") + col("fp") + col("fn") + col("tn")
        hist.agg(
            sum(when(m >= 0, col("pos")).otherwise(0L)).as("tp"),
            sum(when(m >= 0, col("cnt") - col("pos")).otherwise(0L))
              .as("fp"),
            sum(when(m < 0, col("pos")).otherwise(0L)).as("fn"),
            sum(when(m < 0, col("cnt") - col("pos")).otherwise(0L))
              .as("tn"))
          .select(lit(t).as("boost_round"), lit(s.feat).as("feat"),
            lit(s.threshold).as("threshold"), lit(s.gain).as("gain"),
            lit(s.wLeft).as("w_left"), lit(s.wRight).as("w_right"),
            col("tp"), col("fp"), col("fn"), col("tn"),
            when(n > 0, round((col("tp") + col("tn")).cast("double") /
              n.cast("double"), 7)).as("acc"))
      }
    }
    // degenerate inputs (empty, or no valid split) emit ZERO rows like
    // the oracle, preserving the 11-column schema
    val out = roundFrames.reduceOption(_ unionByName _).getOrElse(
      hist.filter(lit(false)).select(lit(1).as("boost_round"),
        lit("").as("feat"), lit(0L).as("threshold"), lit(0.0).as("gain"),
        lit(0.0).as("w_left"), lit(0.0).as("w_right"), lit(0L).as("tp"),
        lit(0L).as("fp"), lit(0L).as("fn"), lit(0L).as("tn"),
        lit(0.0).as("acc")))
    (out, splits, hist)
  }
}
