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
  * the corpus; every round is then algebra BOUNDED by the
  * feature-cardinality product, not rows. r13: when the histogram
  * fits the 2²⁰-cell bounded collect (it always did on the shipped
  * corpora — m22 is 50×11 cells) the per-round algebra runs on the
  * DRIVER, operation-for-operation what the frame pipeline computed
  * (sigmoid = java.lang.Math.exp both sides; round via the same
  * BigDecimal.valueOf/HALF_UP Spark codegen uses; decimal sums as
  * exact scale-9 adds; prefix sums over the sorted distinct values ≡
  * bucketedPrefixSums ascending) — BoostSpec pins local ≡ distributed
  * and the m22/m27 oracles pin end-to-end. Past the bound the pre-r13
  * distributed path (prefix sums via [[Aggregates.bucketedPrefixSums]],
  * one 1-row collect per round — the kCenterCoreset precedent) takes
  * over unchanged. Decimal↔double casts stay exact while |Σg|·10⁹ <
  * 2⁵³ (corpus ≲ 9·10⁶ rows per cell-sum unit) — the shared
  * bucketedPrefixSums magnitude bound, documented there.
  *
  * Output: one row per boosting round — `round`, `feat`, `threshold`
  * (split is `feat <= threshold`), `gain`, `w_left`, `w_right`, and
  * the post-update training confusion `tp/fp/fn/tn` + `acc`.
  */
object Boost {

  final case class Split(feat: String, threshold: Long,
                         gain: Double, wLeft: Double, wRight: Double)

  private final case class Cell(x: Array[Long], cnt: Long, pos: Long)

  import java.math.{BigDecimal => JBD, RoundingMode => RM}
  private def r7(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else JBD.valueOf(x).setScale(7, RM.HALF_UP).doubleValue()
  private def r9(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else JBD.valueOf(x).setScale(9, RM.HALF_UP).doubleValue()
  private def dec(x: Double, s: Int): JBD =
    JBD.valueOf(x).setScale(s, RM.HALF_UP)

  def trainStumps(df: DataFrame, labelCol: String, features: Seq[String],
                  rounds: Int = 3, lr: Double = 0.3,
                  lambda: Double = 1.0): DataFrame =
    trainStumpsCached(df, labelCol, features, rounds, lr, lambda).df

  /** [[trainStumps]] with anything the pipeline persisted handed back
    * for release (the distributed-fallback histogram; empty when the
    * bounded-collect path ran).
    */
  def trainStumpsCached(df: DataFrame, labelCol: String,
                        features: Seq[String], rounds: Int = 3,
                        lr: Double = 0.3, lambda: Double = 1.0): Cached = {
    val (out, _, keep) = trainCore(df, labelCol, features, rounds, lr,
      lambda)
    Cached(out, keep)
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
    * attribution is per-CELL algebra — driver decimal algebra inside
    * the bound (the trainCore stance), per-feature bounded
    * aggregations over the persisted histogram past it.
    */
  def shapStumps(df: DataFrame, labelCol: String, features: Seq[String],
                 rounds: Int = 3, lr: Double = 0.3,
                 lambda: Double = 1.0): DataFrame =
    shapStumpsCached(df, labelCol, features, rounds, lr, lambda).df

  def shapStumpsCached(df: DataFrame, labelCol: String,
                       features: Seq[String], rounds: Int = 3,
                       lr: Double = 0.3, lambda: Double = 1.0): Cached = {
    val spark = df.sparkSession
    histogram(df, labelCol, features) match {
      case Right(cells) =>
        val (_, splits) = trainLocal(spark, cells, features, rounds, lr,
          lambda)
        Cached(shapLocal(spark, cells, splits, features, lr), Seq.empty)
      case Left(hist) =>
        val (_, splits) = trainDistributed(hist, features, rounds, lr,
          lambda)
        Cached(shapDistributed(hist, splits, features, lr), Seq(hist))
    }
  }

  /** The corpus collapse both paths share: Right(cells) inside the
    * 2²⁰-cell bound (driver algebra), Left(persisted histogram frame)
    * past it.
    */
  private def histogram(df: DataFrame, labelCol: String,
                        features: Seq[String])
      : Either[DataFrame, Array[Cell]] = {
    require(features.nonEmpty, "need features")
    val notNull = (features :+ labelCol)
      .map(col(_).isNotNull).reduce(_ && _)
    val hist = df.filter(notNull)
      .groupBy(features.map(f => col(f).cast("long").as(f)): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("pos"))
    Layout.collectBounded(hist, maxRows = 1L << 20) match {
      case Right(rows) => Right(rows.map { r =>
        Cell(Array.tabulate(features.length)(i => r.getLong(i)),
          r.getLong(features.length), r.getLong(features.length + 1))
      })
      case Left(persisted) => Left(persisted)
    }
  }

  private def trainCore(df: DataFrame, labelCol: String,
                        features: Seq[String], rounds: Int,
                        lr: Double, lambda: Double)
      : (DataFrame, Vector[Split], Seq[DataFrame]) = {
    require(features.nonEmpty && rounds >= 1, "need features and rounds")
    val spark = df.sparkSession
    histogram(df, labelCol, features) match {
      case Right(cells) =>
        val (out, splits) = trainLocal(spark, cells, features, rounds,
          lr, lambda)
        (out, splits, Seq.empty)
      case Left(hist) =>
        val (out, splits) = trainDistributed(hist, features, rounds, lr,
          lambda)
        (out, splits, Seq(hist))
    }
  }

  // ---------------------------------------------------------------
  // driver path (histogram within the bounded collect)
  // ---------------------------------------------------------------

  private def outSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("boost_round", IntegerType), StructField("feat",
        StringType), StructField("threshold", LongType),
      StructField("gain", DoubleType), StructField("w_left", DoubleType),
      StructField("w_right", DoubleType), StructField("tp", LongType),
      StructField("fp", LongType), StructField("fn", LongType),
      StructField("tn", LongType), StructField("acc", DoubleType)))
  }

  private def trainLocal(spark: org.apache.spark.sql.SparkSession,
                         cells: Array[Cell], features: Seq[String],
                         rounds: Int, lr: Double, lambda: Double)
      : (DataFrame, Vector[Split]) = {
    val fIdx = features.zipWithIndex.toMap

    // margin after the splits chosen so far — the same fold, 9dp after
    // every additive step
    def marginOf(x: Array[Long], splits: Seq[Split]): Double =
      splits.foldLeft(0.0) { (m, s) =>
        r9(m + lr * (if (x(fIdx(s.feat)) <= s.threshold) s.wLeft
                     else s.wRight))
      }

    def bestSplit(splits: Seq[Split]): Option[Split] = {
      // per-cell p/g/h; totals and per-(feature, value) sums as exact
      // scale-9 decimals (≡ the DECIMAL(30,9) frame sums)
      var tg = JBD.ZERO; var th = JBD.ZERO; var tc = 0L
      val perFeat = Array.fill(features.length)(
        scala.collection.mutable.TreeMap
          .empty[Long, (JBD, JBD, Long)])
      var ci = 0
      while (ci < cells.length) {
        val c = cells(ci)
        val m = marginOf(c.x, splits)
        val p = r7(1.0 / (1.0 + math.exp(-m)))
        val g = dec(r9(c.cnt * p - c.pos), 9)
        val h = dec(r9((c.cnt * p) * (1.0 - p)), 9)
        tg = tg.add(g); th = th.add(h); tc += c.cnt
        var fi = 0
        while (fi < features.length) {
          val v = c.x(fi)
          val (fg, fh, fc) = perFeat(fi).getOrElse(v,
            (JBD.ZERO, JBD.ZERO, 0L))
          perFeat(fi)(v) = (fg.add(g), fh.add(h), fc + c.cnt)
          fi += 1
        }
        ci += 1
      }
      val gD = tg.doubleValue(); val hD = th.doubleValue()
      // argmin over struct(-gain, feat, value): max gain, then the
      // lexicographically smallest feature, then the smallest value
      var best: Option[Split] = None
      var fi = 0
      while (fi < features.length) {
        var gl = JBD.ZERO; var hl = JBD.ZERO; var cl = 0L
        for ((v, (fg, fh, fc)) <- perFeat(fi)) {
          gl = gl.add(fg); hl = hl.add(fh); cl += fc
          if (cl < tc) { // max value: right side empty
            // the distributed twin's cum decimals pass through one
            // decimal(38,9) + decimal(38,9) ADD (window-local +
            // bucket offset), whose result type is decimal(38,8) by
            // the precision-overflow rule — i.e. every prefix sum is
            // HALF_UP-rounded to 8dp before the double cast. Replayed
            // exactly (hex-level divergence in round-3 leaf weights
            // without it; the m22/m27 oracles pin this behavior).
            val glD = gl.setScale(8, RM.HALF_UP).doubleValue()
            val hlD = hl.setScale(8, RM.HALF_UP).doubleValue()
            val grD = gD - glD; val hrD = hD - hlD
            // gain rounds at 7dp, not the 9dp of g/h/weights (the
            // .5e-9 boundary note in the distributed twin)
            val gain = r7((glD * glD) / (hlD + lambda)
              + (grD * grD) / (hrD + lambda) - (gD * gD) / (hD + lambda))
            val s = Split(features(fi), v, gain,
              r9(-glD / (hlD + lambda)), r9(-grD / (hrD + lambda)))
            val better = best match {
              case None => true
              case Some(b) =>
                // the distributed twin minimizes struct(-gain, feat,
                // v): a NaN gain negates to NaN = catalyst's GREATEST
                // double, so NaN loses to any real gain (cannot occur
                // with λ > 0 — kept for exactness)
                val cmp =
                  if (s.gain.isNaN && b.gain.isNaN) 0
                  else if (s.gain.isNaN) -1
                  else if (b.gain.isNaN) 1
                  else java.lang.Double.compare(s.gain, b.gain)
                cmp > 0 || (cmp == 0 &&
                  (s.feat < b.feat || (s.feat == b.feat &&
                    s.threshold < b.threshold)))
            }
            if (better) best = Some(s)
          }
        }
        fi += 1
      }
      best
    }

    var splits = Vector.empty[Split]
    val rows = (1 to rounds).flatMap { t =>
      bestSplit(splits).map { s =>
        splits = splits :+ s
        var tp = 0L; var fp = 0L; var fn = 0L; var tn = 0L
        var ci = 0
        while (ci < cells.length) {
          val c = cells(ci)
          if (marginOf(c.x, splits) >= 0) {
            tp += c.pos; fp += c.cnt - c.pos
          } else { fn += c.pos; tn += c.cnt - c.pos }
          ci += 1
        }
        val n = tp + fp + fn + tn
        val acc: Any =
          if (n > 0) r7((tp + tn).toDouble / n.toDouble) else null
        org.apache.spark.sql.Row(t, s.feat, s.threshold, s.gain,
          s.wLeft, s.wRight, tp, fp, fn, tn, acc)
      }
    }
    (spark.createDataFrame(java.util.Arrays.asList(rows: _*), outSchema),
      splits)
  }

  private def shapLocal(spark: org.apache.spark.sql.SparkSession,
                        cells: Array[Cell], splits: Vector[Split],
                        features: Seq[String], lr: Double): DataFrame = {
    val fIdx = features.zipWithIndex.toMap
    // per-stump training expectation E[f_t] = lr·(nL·wL + nR·wR)/n —
    // the same double chain the distributed twin states
    val counts = splits.map { s =>
      var nl = 0L; var n = 0L
      cells.foreach { c =>
        if (c.x(fIdx(s.feat)) <= s.threshold) nl += c.cnt
        n += c.cnt
      }
      (nl, n)
    }
    val n = counts.headOption.map(_._2).getOrElse(0L)
    val exps = splits.zip(counts).map { case (s, (nl, nn)) =>
      lr * ((nl.toDouble * s.wLeft + (nn - nl).toDouble * s.wRight) /
        nn.toDouble)
    }
    val rows = features.sorted.map { f =>
      val fi = fIdx(f)
      // fixed round order with exact-zero terms for other features'
      // stumps (adding 0.0 is an IEEE identity — the distributed note)
      def phi(x: Array[Long]): Double =
        r7(splits.zip(exps).foldLeft(0.0) { case (acc, (s, e)) =>
          if (s.feat == f)
            acc + (lr * (if (x(fIdx(s.feat)) <= s.threshold) s.wLeft
                         else s.wRight) - e)
          else acc
        })
      val base = splits.zip(exps)
        .foldLeft(0.0)((a, se) => if (se._1.feat == f) a + se._2 else a)
      var sa = JBD.ZERO; var ss = JBD.ZERO
      cells.foreach { c =>
        val ph = phi(c.x)
        sa = sa.add(JBD.valueOf(c.cnt).multiply(dec(math.abs(ph), 7)))
        ss = ss.add(JBD.valueOf(c.cnt).multiply(dec(ph, 7)))
      }
      val meanShap: Any =
        if (n > 0) r7(ss.doubleValue() / n.toDouble) else null
      val meanAbs: Any =
        if (n > 0) r7(sa.doubleValue() / n.toDouble) else null
      org.apache.spark.sql.Row(f, r7(base), meanShap, meanAbs)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("feat", StringType),
        StructField("base", DoubleType),
        StructField("mean_shap", DoubleType),
        StructField("mean_abs_shap", DoubleType))))
  }

  // ---------------------------------------------------------------
  // distributed fallback (histogram past the bounded collect) — the
  // pre-r13 pipeline verbatim, minus the corpus collapse it receives
  // ---------------------------------------------------------------

  private[graft] def trainDistributed(hist: DataFrame, features: Seq[String],
                               rounds: Int, lr: Double, lambda: Double)
      : (DataFrame, Vector[Split]) = {
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
    (out, splits)
  }

  private[graft] def shapDistributed(hist: DataFrame, splits: Vector[Split],
                              features: Seq[String],
                              lr: Double): DataFrame = {
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
    perFeat.reduce(_ unionByName _).orderBy(col("feat"))
  }
}
