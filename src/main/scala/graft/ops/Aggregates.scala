package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators — SURVEY §2.4 A1-A18.
  *
  * Everything is a declarative aggregate / window expression: map-side
  * partial aggregation, whole-stage codegen, and AQE all apply untouched.
  * No driver-side loops on data paths — each of these holds at 100 TB
  * because the only shuffles are on the explicit grouping keys.
  */
object Aggregates {

  /** A1/A2: running per-class counters — the consumer's two process
    * globals (`FD/consumer.py:18-20,127-131`) as a grouped count. In
    * streaming this runs in update mode against the state store.
    */
  def classCounters(df: DataFrame, predCol: String): DataFrame =
    df.groupBy(col(predCol)).agg(count(lit(1)).as("cnt"))

  /** A5: most frequent value per group with the pandas `Series.mode()[0]`
    * tie-break (smallest value wins — `FD/evaluation.py:170,172`).
    * Two-phase: count per (group, value) then one row_number window — both
    * shuffle only on the grouping key.
    */
  def modePerGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counted = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col(valueCol).asc)
    counted.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(groupCol), col(valueCol).as("mode_value"))
  }

  /** A7: last value per key by a monotonic ordinal — the counts.log
    * reverse scan (`FD/dashboard.py:150-163`). `max_by` is a single-pass
    * declarative aggregate: one shuffle on the key, no window needed.
    */
  def lastPerKey(df: DataFrame, keyCol: String, ordCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(
      max_by(col(valueCol), col(ordCol)).as("last_value"),
      max(col(ordCol)).as("last_ord"))

  /** A6: top-k rows by a value column (`FD/model.py:181-183`). Spark plans
    * order+limit as TakeOrderedAndProject — per-partition heap + driver
    * merge of k rows, never a full sort of the data.
    */
  def topK(df: DataFrame, valueCol: String, k: Int, tieBreak: String): DataFrame =
    df.orderBy(col(valueCol).desc, col(tieBreak).asc).limit(k)

  /** A6 grouped variant: top-k rows per group by value. The window is
    * partitioned by the group key, so ranking parallelizes across
    * groups; a single hot group is the salting case (`Layout`), not
    * this operator's.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                   k: Int, tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).desc +: tieBreak.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** A8: tail-N by ordinal (`FD/dashboard.py:24`), returned in display
    * (ascending) order.
    */
  def tailN(df: DataFrame, ordCol: String, n: Int): DataFrame =
    df.orderBy(col(ordCol).desc).limit(n).orderBy(col(ordCol).asc)

  /** A9: confusion counts tn/fp/fn/tp as four conditional sums
    * (`FD/model.py:132-133`) — one row out, single aggregate, no pivot.
    */
  def confusionCounts(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val l = col(labelCol); val p = col(predCol)
    df.agg(
      sum(when(l === 0 && p === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(l === 0 && p === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(l === 1 && p === 0, 1L).otherwise(0L)).as("fn"),
      sum(when(l === 1 && p === 1, 1L).otherwise(0L)).as("tp"))
  }

  /** A11-A14: the reference's scalar metric battery (`FD/model.py:131-146`)
    * computed from the one-row confusion frame — accuracy %, weighted
    * precision/recall/F1 (sklearn `classification_report` weighted avg),
    * specificity, FPR, FNR, Matthews correlation coefficient. All plain
    * arithmetic over A9's four counts; runs on one row.
    */
  def binaryMetrics(confusion: DataFrame,
                    carryCols: Seq[String] = Nil): DataFrame = {
    val tn = col("tn").cast("double"); val fp = col("fp").cast("double")
    val fn = col("fn").cast("double"); val tp = col("tp").cast("double")
    val n = tn + fp + fn + tp
    val support0 = tn + fp; val support1 = fn + tp
    // per-class precision/recall with sklearn's 0-on-0/0 convention
    def safeDiv(a: Column, b: Column): Column =
      when(b === 0, 0.0).otherwise(a / b)
    val p0 = safeDiv(tn, tn + fn); val p1 = safeDiv(tp, tp + fp)
    val r0 = safeDiv(tn, tn + fp); val r1 = safeDiv(tp, tp + fn)
    val f0 = safeDiv(lit(2) * p0 * r0, p0 + r0)
    val f1 = safeDiv(lit(2) * p1 * r1, p1 + r1)
    val mccDen = sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    confusion.select(carryCols.map(col) ++ Seq(
      ((tp + tn) / n * 100).as("accuracy"),
      ((p0 * support0 + p1 * support1) / n).as("precision_weighted"),
      ((r0 * support0 + r1 * support1) / n).as("recall_weighted"),
      ((f0 * support0 + f1 * support1) / n).as("f1_weighted"),
      safeDiv(tn, tn + fp).as("specificity"),
      safeDiv(fp, fp + tn).as("false_positive_rate"),
      safeDiv(fn, fn + tp).as("false_negative_rate"),
      when(mccDen === 0, 0.0)
        .otherwise((tp * tn - fp * fn) / mccDen).as("matthews_corrcoef"))
      .toIndexedSeq: _*)
  }

  /** COHEN'S KAPPA from the one-row confusion frame — chance-corrected
    * agreement, the metric the battery still lacked: accuracy rewards
    * a majority-class rubber stamp, MCC is correlation-shaped; κ reads
    * directly as "agreement beyond chance" ((p_o − p_e)/(1 − p_e) with
    * p_e from the marginal products), the standard for label-quality
    * audits between two annotators (here: label vs prediction — for
    * binary single-rater-pair data κ and MCC differ unless marginals
    * match, which is exactly the imbalance signal). Same fixed-order
    * double arithmetic over the four integer counts as
    * [[binaryMetrics]]; κ null when p_e = 1 (a degenerate constant
    * pair, where agreement beyond chance is undefined).
    */
  def cohensKappa(confusion: DataFrame): DataFrame = {
    val tn = col("tn").cast("double"); val fp = col("fp").cast("double")
    val fn = col("fn").cast("double"); val tp = col("tp").cast("double")
    val n = tn + fp + fn + tp
    val po = (tp + tn) / n
    val pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    confusion.select(
      (col("tn") + col("fp") + col("fn") + col("tp")).as("n"),
      round(po, 7).as("po"), round(pe, 7).as("pe"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 7)).as("kappa"))
  }

  /** Per-class classification-report rows (`FD/model.py:136-139` —
    * sklearn `classification_report`'s per-class block): one row per
    * class with precision / recall / F1 / support, from the same one-row
    * confusion frame as [[binaryMetrics]]. Two rows out via an inline
    * array explode — still a single aggregate pass upstream.
    */
  def classReport(confusion: DataFrame): DataFrame = {
    val tn = col("tn").cast("double"); val fp = col("fp").cast("double")
    val fn = col("fn").cast("double"); val tp = col("tp").cast("double")
    def safeDiv(a: Column, b: Column): Column =
      when(b === 0, 0.0).otherwise(a / b)
    val p0 = safeDiv(tn, tn + fn); val p1 = safeDiv(tp, tp + fp)
    val r0 = safeDiv(tn, tn + fp); val r1 = safeDiv(tp, tp + fn)
    val f0 = safeDiv(lit(2) * p0 * r0, p0 + r0)
    val f1 = safeDiv(lit(2) * p1 * r1, p1 + r1)
    confusion
      .select(explode(array(
        struct(lit(0).as("label_class"), p0.as("precision"), r0.as("recall"),
          f0.as("f1"), (tn + fp).cast("long").as("support")),
        struct(lit(1).as("label_class"), p1.as("precision"), r1.as("recall"),
          f1.as("f1"), (fn + tp).cast("long").as("support"))))
        .as("row"))
      .select(col("row.*"))
  }

  /** A15: log loss with sklearn's eps clipping (`FD/model.py:145`). */
  def logLoss(df: DataFrame, labelCol: String, probaCol: String,
              eps: Double = 1e-15): DataFrame = {
    val p = greatest(least(col(probaCol), lit(1 - eps)), lit(eps))
    df.agg((-avg(when(col(labelCol) === 1, log(p)).otherwise(log(lit(1) - p))))
      .as("log_loss"))
  }

  /** Probability-calibration diagnostics: Brier score and expected
    * calibration error over `bins` equal-width probability bins
    * (Guo et al. 2017, "On Calibration of Modern Neural Networks"):
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b|, which telescopes to
    * Σ_b |Σy − Σp| / N — so ONE grouped pass (bin → exact sums) and a
    * tiny final fold computes both; no window, no sort, map-side
    * partials absorb the row stream. Probabilities and labels sum as
    * DECIMAL(18,6) so the per-bin sums are exact and engine-identical
    * (the dsum parity rule) — only the final two divisions are float.
    * p = 1.0 clamps into the last bin.
    */
  def calibration(df: DataFrame, labelCol: String, probaCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val p = col(probaCol).cast(dec)
    val y = col(labelCol).cast(dec)
    val bin = least(floor(col(probaCol) * bins), lit(bins - 1)).cast("int")
    df.select(bin.as("bin"), p.as("p"), y.as("y"),
        ((p - y) * (p - y)).as("sq"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("psum"),
        sum(col("y")).as("ysum"), sum(col("sq")).as("sqsum"))
      .agg(
        (sum(col("sqsum")).cast("double") / sum(col("n"))).as("brier"),
        (sum(abs(col("ysum") - col("psum"))).cast("double") /
          sum(col("n"))).as("ece"),
        count(lit(1)).as("n_bins"))
  }

  /** Partition-parallel prefix sums over a frame whose `orderCol` values
    * are DISTINCT non-null numerics (i.e. the frame is already grouped by
    * the order key). Replaces the classic `Window.orderBy(k)` global
    * cumulative sum — which Spark executes as a SINGLE-partition sort
    * (`WARN WindowExec: No Partition Defined`) — with a plan that stays
    * parallel end to end:
    *
    *   1. bucket each row by its position in the [min, max] value range
    *      (any monotonic bucketing preserves prefix-sum identity);
    *   2. local cumulative sums via a window PARTITIONED by bucket;
    *   3. per-bucket totals → per-bucket offsets through a broadcast
    *      triangular self-join over the ≤`buckets`-row totals frame (no
    *      window at all, so no single-partition stage anywhere);
    *   4. prefix = local cum + bucket offset.
    *
    * Adds one `cum_<c>` column per requested sum column. Integer-valued
    * inputs stay exact (offset+local decomposition is plain addition), so
    * results are bit-identical to the global-window spelling.
    */
  def bucketedPrefixSums(df: DataFrame, orderCol: String, ascending: Boolean,
                         sumCols: Seq[String], buckets: Int = 1024,
                         groupCols: Seq[String] = Nil): DataFrame = {
    // __k (double) drives only BUCKET ASSIGNMENT — round-to-nearest is
    // monotone, and two distinct keys that collide in double land in the
    // same bucket, so bucketing stays order-consistent at any magnitude.
    // The within-bucket window orders by the NATIVE key (__ko): an
    // integral order column above 2^53 would collide in the double cast
    // and make rank assignment order-dependent (Mann-Whitney consumer).
    val keyNative = col(orderCol)
    val keyed = df
      .withColumn("__ko", keyNative)
      .withColumn("__k",
        if (ascending) keyNative.cast("double")
        else -keyNative.cast("double"))
    val gcols = groupCols.map(col)
    // per-group bucketing range; the stats frame is one row per group
    // (tiny for the model-comparison use) and broadcasts either way
    val stats =
      if (groupCols.isEmpty)
        keyed.agg(min(col("__k")).as("__mn"), max(col("__k")).as("__mx"))
      else
        keyed.groupBy(gcols: _*)
          .agg(min(col("__k")).as("__mn"), max(col("__k")).as("__mx"))
    // group joins are NULL-SAFE throughout: a null group key is a
    // legitimate group (groupBy keeps it), and a plain equi-join would
    // silently drop its rows
    val withStats =
      if (groupCols.isEmpty) keyed.crossJoin(broadcast(stats))
      else {
        val statsR = stats.select(
          (groupCols.zipWithIndex.map { case (g, i) =>
            col(g).as(s"__sg$i") } ++ Seq(col("__mn"), col("__mx"))): _*)
        keyed.join(broadcast(statsR),
          groupCols.zipWithIndex.map { case (g, i) =>
            col(g) <=> col(s"__sg$i") }.reduce(_ && _))
          .drop(groupCols.indices.map(i => s"__sg$i"): _*)
      }
    val bucketed = withStats
      .withColumn("__bkt",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            floor((col("__k") - col("__mn")) / (col("__mx") - col("__mn"))
              * buckets),
            lit(buckets - 1L))))
      .drop("__mn", "__mx")
    val localW = Window.partitionBy((gcols :+ col("__bkt")): _*)
      .orderBy(if (ascending) col("__ko").asc else col("__ko").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sumCols.foldLeft(bucketed) { (d, c) =>
      d.withColumn(s"__loc_$c", sum(col(c)).over(localW))
    }
    // per-(group, bucket) totals → per-bucket offsets via the triangular
    // self-join, group-equality added so prefixes never cross groups
    val totals = bucketed
      .groupBy((groupCols.zipWithIndex.map { case (g, i) =>
        col(g).as(s"__tg$i") } :+ col("__bkt").as("__tbkt")): _*)
      .agg(sum(col(sumCols.head)).as(s"__tot_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"__tot_$c")): _*)
    val lhs = totals.select((groupCols.indices.map(i =>
      col(s"__tg$i").as(s"__og$i")) :+ col("__tbkt").as("__obkt")): _*)
    val triangular = groupCols.indices
      .map(i => col(s"__og$i") <=> col(s"__tg$i"))
      .foldLeft(col("__tbkt") < col("__obkt"))(_ && _)
    val offsets = lhs.join(broadcast(totals), triangular, "left")
      .groupBy((groupCols.indices.map(i => col(s"__og$i")) :+
        col("__obkt")): _*)
      .agg(sum(col(s"__tot_${sumCols.head}")).as(s"__off_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(s"__tot_$c")).as(s"__off_$c")): _*)
    val joinCond = groupCols.zipWithIndex
      .map { case (g, i) => local(g) <=> col(s"__og$i") }
      .foldLeft(col("__bkt") === col("__obkt"))(_ && _)
    val joined = local.join(broadcast(offsets), joinCond, "left")
    val withCums = sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"cum_$c",
        col(s"__loc_$c") + coalesce(col(s"__off_$c"), lit(0)))
    }
    withCums.select((df.columns.map(col) ++
      sumCols.map(c => col(s"cum_$c"))).toIndexedSeq: _*)
  }

  /** A16: ROC AUC via the rank-sum (Mann-Whitney U) identity — exactly
    * `sklearn.roc_auc_score` including tie handling through average ranks.
    * Ranks come from `groupBy(proba)` counts + a partition-parallel prefix
    * sum ([[bucketedPrefixSums]]) — no global window, so the plan has no
    * single-partition stage and shuffles only the distinct-score frame.
    * Average-rank values are half-integers (exact in double), so the sum
    * is order-independent and matches the per-row global-rank spelling
    * bit for bit. Returns null when only one class is present (the
    * reference guards this case, `FD/evaluation.py:148-151`).
    */
  def rocAuc(df: DataFrame, labelCol: String, probaCol: String): DataFrame =
    rocAucFromHist(scoreHistogram(df, labelCol, probaCol))

  /** The per-distinct-score histogram (p, cnt, pos) every ranking
    * metric in this file reduces to — cnt/pos as integer-valued
    * DOUBLES (counts are exact in double far past any real corpus).
    * This is the BOUNDED state a streaming evaluator maintains (st20):
    * rows ∝ score cardinality, never row count; [[rocAucFromHist]] /
    * [[prCurveFromHist]] / [[thresholdBattery]] then collapse it
    * batch-side to the same bits as the row-frame spellings.
    */
  def scoreHistogram(df: DataFrame, labelCol: String,
                     probaCol: String): DataFrame =
    df.select(col(probaCol).as("p"), col(labelCol).cast("double").as("y"))
      .groupBy(col("p"))
      .agg(count(lit(1)).cast("double").as("cnt"), sum(col("y")).as("pos"))

  /** [[rocAuc]] over a prebuilt [[scoreHistogram]] frame. Totals come
    * from the histogram's grouped sums — integer-valued doubles, so
    * bit-identical to summing the raw rows. */
  def rocAucFromHist(perP: DataFrame): DataFrame = {
    val cum = bucketedPrefixSums(perP, "p", ascending = true, Seq("cnt"))
    // min-rank of the tie group = cum_cnt - cnt + 1, so the shared
    // average rank = min-rank + (cnt-1)/2 = cum_cnt - cnt + (cnt+1)/2
    val ranked = cum.withColumn("r",
      col("cum_cnt") - col("cnt") + (col("cnt") + 1) / 2.0)
    ranked.agg(
      when(sum(col("pos")) === 0 || sum(col("cnt") - col("pos")) === 0,
        lit(null))
        .otherwise(
          (sum(col("pos") * col("r")) -
            sum(col("pos")) * (sum(col("pos")) + 1) / 2.0) /
            (sum(col("pos")) * sum(col("cnt") - col("pos")))).as("roc_auc"))
  }

  /** [[rocAuc]] per group in ONE pass: same rank-sum identity, every
    * stage keyed by the group columns (grouped prefix sums included) —
    * evaluating N models costs one traversal of the union'd scored
    * frame instead of N separate AUC plans. Null AUC for single-class
    * groups, like the ungrouped form.
    */
  def rocAucByGroup(df: DataFrame, labelCol: String, probaCol: String,
                    groupCols: Seq[String]): DataFrame = {
    val gcols = groupCols.map(col)
    val perP = df
      .select((gcols :+ col(probaCol).as("p") :+
        col(labelCol).cast("double").as("y")): _*)
      .groupBy((gcols :+ col("p")): _*)
      .agg(count(lit(1)).cast("double").as("cnt"), sum(col("y")).as("pos"))
    val cum = bucketedPrefixSums(perP, "p", ascending = true, Seq("cnt"),
      groupCols = groupCols)
    val ranked = cum.withColumn("r",
      col("cum_cnt") - col("cnt") + (col("cnt") + 1) / 2.0)
    ranked.groupBy(gcols: _*).agg(
      when(sum(col("pos")) === 0 || sum(col("cnt") - col("pos")) === 0,
        lit(null))
        .otherwise(
          (sum(col("pos") * col("r")) -
            sum(col("pos")) * (sum(col("pos")) + 1) / 2.0) /
            (sum(col("pos")) * sum(col("cnt") - col("pos")))).as("roc_auc"))
  }

  /** ROC curve point frame (`FD/model.py:155-171`): per distinct
    * threshold, descending, the (fpr, tpr) reached by predicting positive
    * at score ≥ threshold. Same parallel prefix-sum plan as [[rocAuc]].
    */
  def rocCurve(df: DataFrame, labelCol: String, probaCol: String): DataFrame = {
    val perP = scoreHistogram(df, labelCol, probaCol)
    val perTh = perP.select(col("p").as("th"), col("pos"),
      (col("cnt") - col("pos")).as("neg"))
    val totals = perTh.agg(sum(col("pos")).as("total_pos"),
      sum(col("neg")).as("total_neg"))
    bucketedPrefixSums(perTh, "th", ascending = false, Seq("pos", "neg"))
      .crossJoin(broadcast(totals))
      .select(col("th").as("threshold"),
        (col("cum_neg") / col("total_neg")).as("fpr"),
        (col("cum_pos") / col("total_pos")).as("tpr"))
  }

  /** PR curve point frame (`FD/evaluation.py:91-95`): per distinct
    * threshold, descending, cumulative precision / recall / F1 (F1 null
    * when precision+recall = 0, mirroring the numpy NaN row).
    */
  def prCurve(df: DataFrame, labelCol: String, probaCol: String): DataFrame =
    prCurveFromHist(scoreHistogram(df, labelCol, probaCol))

  /** [[prCurve]] over a prebuilt [[scoreHistogram]] frame. */
  def prCurveFromHist(perP: DataFrame): DataFrame = {
    val perTh = perP.select(col("p").as("th"), col("pos"),
      (col("cnt") - col("pos")).as("neg"))
    val totals = perTh.agg(sum(col("pos")).as("total_pos"))
    bucketedPrefixSums(perTh, "th", ascending = false, Seq("pos", "neg"))
      .crossJoin(broadcast(totals))
      .withColumn("precision",
        col("cum_pos") / (col("cum_pos") + col("cum_neg")))
      // ANSI guard: a zero-positive stream makes total_pos = 0 and
      // Spark 4 ANSI raises DIVIDE_BY_ZERO even for doubles — null
      // recall nulls f1, which the optimal-threshold filter drops
      .withColumn("recall",
        when(col("total_pos") > 0, col("cum_pos") / col("total_pos")))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, lit(null))
          .otherwise(lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .select(col("th").as("threshold"), col("precision"), col("recall"),
        col("f1"))
  }

  /** A17: PR-curve optimal threshold (`FD/evaluation.py:91-95,139-140`).
    * The [[prCurve]] frame (partition-parallel — no global window; the
    * cumulative tp/fp are exact integer-valued doubles, so the F1 doubles
    * match the global-window spelling bit for bit), argmax'd with the
    * NaN-skipping tie-break: highest F1, then lowest threshold.
    */
  def optimalThreshold(df: DataFrame, labelCol: String, probaCol: String): DataFrame =
    optimalThresholdFromHist(scoreHistogram(df, labelCol, probaCol))

  /** [[optimalThreshold]] over a prebuilt [[scoreHistogram]] frame.
    * The NaN guard covers the zero-positive stream: recall = 0/0
    * propagates NaN through f1, and Spark sorts NaN ABOVE every
    * double — without the filter a single-class input would "win"
    * with a NaN best_f1 instead of returning no threshold. */
  def optimalThresholdFromHist(perP: DataFrame): DataFrame =
    prCurveFromHist(perP)
      .filter(col("f1").isNotNull && !isnan(col("f1")))
      .orderBy(col("f1").desc, col("threshold").asc)
      .limit(1)
      .select(col("threshold").as("optimal_threshold"), col("f1").as("best_f1"))

  /** The full `FD/evaluation.py:97-179` dashboard-tick battery from ONE
    * bounded [[scoreHistogram]]: PR-optimal threshold (A17), the
    * threshold-ADJUSTED confusion metrics the reference reports —
    * precision/recall at `proba >= t_opt` with sklearn's
    * `zero_division = 0`, accuracy as a percentage, the adjusted
    * positive count — and rank-sum ROC AUC (A16). Every input to a
    * division is an integer-valued double (exact), every division is a
    * single fixed-order expression, so an oracle replaying the same
    * algebra over the same histogram matches bit for bit. Returns one
    * row; EMPTY when no threshold has precision+recall > 0 (a
    * single-class stream — the reference's NaN-argmax corner, which
    * its own dashboard never reaches either).
    */
  def thresholdBattery(perP: DataFrame): DataFrame = {
    val opt = optimalThresholdFromHist(perP)
    val auc = rocAucFromHist(perP)
    perP.crossJoin(broadcast(opt))
      .agg(
        sum(when(col("p") >= col("optimal_threshold"), col("pos"))
          .otherwise(0.0)).as("tp"),
        sum(when(col("p") >= col("optimal_threshold"),
          col("cnt") - col("pos")).otherwise(0.0)).as("fp"),
        sum(col("cnt")).as("n"),
        sum(col("pos")).as("total_pos"),
        // the cross join replicates opt's single row; first() reads it
        // back without a second join
        first(col("optimal_threshold")).as("optimal_threshold"),
        first(col("best_f1")).as("best_f1"))
      // a global agg over the empty single-class cross join still emits
      // one (all-null) row — drop it to honor the empty-result contract
      .filter(col("optimal_threshold").isNotNull)
      .crossJoin(broadcast(auc))
      .select(
        col("optimal_threshold"), col("best_f1"), col("roc_auc"),
        when(col("tp") + col("fp") === 0, 0.0)
          .otherwise(col("tp") / (col("tp") + col("fp")))
          .as("precision_adj"),
        when(col("total_pos") === 0, 0.0)
          .otherwise(col("tp") / col("total_pos")).as("recall_adj"),
        ((col("tp") + (col("n") - col("total_pos") - col("fp")))
          / col("n") * 100).as("accuracy_adj"),
        (col("tp") + col("fp")).cast("long")
          .as("predicted_adjusted_total"))
  }

  /** Exact top-k values by frequency in two passes at sketch memory: a
    * mergeable Misra–Gries pass (`functions/MisraGriesAgg`) proposes
    * ≤ `capacity` candidates — every value with true frequency >
    * n/(capacity+1) is guaranteed among them — then one exact count of
    * just the candidate set orders them. Provably exact whenever the
    * k-th true frequency clears that bound (always when capacity exceeds
    * the column's cardinality; for skewed data with modest capacity).
    * The candidate set never leaves the cluster: it broadcasts into a
    * semi-join, so no driver-side collect at any cardinality.
    */
  def exactTopKByFreq(df: DataFrame, valueCol: String, k: Int,
                      capacity: Int): DataFrame = {
    val sketch = df.agg(graft.functions.MisraGriesAgg
      .heavyHitters(col(valueCol).cast("string"), capacity).as("mg"))
    val cands = sketch.select(explode(map_keys(col("mg"))).as("__cand"))
    df.join(broadcast(cands),
        col(valueCol).cast("string") === col("__cand"), "left_semi")
      .groupBy(col(valueCol)).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col(valueCol).asc)
      .limit(k)
  }

  /** Sketch aggregates for the 100 TB path: HyperLogLog++ distinct
    * counting and approximate quantiles — the constant-memory stand-ins
    * for exact distinct/percentile when cardinality explodes. (Beyond
    * the reference surface; rows-only gate + tolerance spec since
    * sketch internals differ across engines.)
    */
  def sketchProfile(df: DataFrame, keyCol: String, valueCol: String,
                    rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(keyCol), rsd).as("approx_distinct"),
      countDistinct(col(keyCol)).as("exact_distinct"),
      percentile_approx(col(valueCol), lit(0.5), lit(10000)).as("p50"),
      percentile_approx(col(valueCol), lit(0.99), lit(10000)).as("p99"))

  /** Engine-portable distinct-count sketches: HyperLogLog registers and
    * a KMV (k-minimum-values) estimator, both driven by md5 so any SQL
    * engine replays every register and every produced double bit-exactly
    * (the a20 `sketchProfile` keeps Spark's native HLL++ for the perf
    * path; this is its hash-gated twin).
    *
    * Determinism contract: all register math is INTEGER (each register's
    * contribution to the harmonic sum is the exact `2^(50-rank)` BIGINT,
    * summed order-independently), and each emitted double is ONE
    * division of exact inputs — no transcendental, no float
    * accumulation, so Spark and DuckDB produce identical bits. The HLL
    * estimate is the RAW harmonic-mean formula (`alpha·m²/Σ2^-M_j`);
    * the small-range linear-counting correction needs `ln`, so instead
    * of risking libm divergence the inputs it would use (`m`,
    * `nonzero`) are emitted as integer columns and the tolerance
    * assertions live in AggregatesSpec.
    *
    * Scale shape: one narrow shuffle on the register id (m=16 rows),
    * one sort-limit for the KMV frontier (TakeOrdered, k rows) — both
    * constant-size reductions of an arbitrarily large scan, the whole
    * point of sketching at 100 TB.
    */
  /** md5-derived (register, rank) pair for the portable HLL — shared by
    * the batch sketch and the streaming constant-state variant (st11).
    * Register = first hex digit (m=16); rank = leading zeros of the
    * next 48 bits + 1. `bin()` drops leading zeros in BOTH engines, so
    * rank = 49 − len(bin(v)) with the v=0 case pinned to 49.
    */
  def hllRegRank(keyCol: String): (Column, Column) = {
    val key = col(keyCol).cast("string")
    val h = md5(concat(lit("hll:"), key).cast("binary"))
    val v48 = conv(substring(h, 2, 12), 16, 10).cast("long")
    val rank = when(v48 === 0, lit(49))
      .otherwise(lit(49) - length(bin(v48)))
    (conv(substring(h, 1, 1), 16, 10).cast("int"), rank)
  }

  /** Collapse an m=16 `(reg, r)` register frame (max rank per register)
    * to the one-row raw HLL estimate. Integer harmonic sum (each
    * register contributes the exact BIGINT `2^(50-rank)`), one final
    * division — deterministic across engines.
    */
  def hllEstimateFromRegisters(regs: DataFrame): DataFrame = {
    val m = 16
    // empty registers contribute 2^-0 = 1 each → 2^50 in scaled units
    val hll = regs.agg(count(lit(1)).as("nonzero"),
      sum(expr("shiftleft(1L, cast(50 - r as int))")).as("s_present"))
      .select(col("nonzero"),
        (col("s_present") + (lit(m.toLong) - col("nonzero")) *
          lit(1L << 50)).as("hll_s"))
    val alpha = lit(0.673) // published alpha_16 constant, m = 16
    hll.select(col("nonzero").as("hll_nonzero"),
      col("hll_s"),
      (alpha * lit(m.toDouble * m.toDouble) * lit((1L << 50).toDouble) /
        col("hll_s").cast("double")).as("hll_raw_est"))
  }

  def distinctSketchesPortable(df: DataFrame, keyCol: String,
                               kmvK: Int = 64): DataFrame = {
    val key = col(keyCol).cast("string")
    val (reg, rank) = hllRegRank(keyCol)
    val regs = df.filter(col(keyCol).isNotNull)
      .select(reg.as("reg"), rank.as("rk"))
      .groupBy(col("reg")).agg(max(col("rk")).as("r"))
    val hllEst = hllEstimateFromRegisters(regs)
    // KMV: k-th smallest md5 over DISTINCT keys; est = (k-1)/v_k with
    // v_k the 48-bit hash prefix as an exact dyadic fraction in [0,1)
    val kh = df.filter(col(keyCol).isNotNull)
      .select(md5(concat(lit("kmv:"), key).cast("binary")).as("kh"))
      .distinct()
    val frontier = kh.orderBy(col("kh")).limit(kmvK)
    val kmv = frontier.agg(count(lit(1)).as("kmv_n"),
      max(col("kh")).as("kmv_kth"))
      .select(col("kmv_n"),
        when(col("kmv_n") < kmvK, col("kmv_n").cast("double"))
          .otherwise(lit((kmvK - 1).toDouble) /
            (conv(substring(col("kmv_kth"), 1, 12), 16, 10).cast("double") /
              lit((1L << 48).toDouble))).as("kmv_est"))
    val exact = df.filter(col(keyCol).isNotNull)
      .agg(countDistinct(col(keyCol)).as("n_exact"))
    // 1-row frames; hinted so the CartesianGuard interlock sees the
    // bounded-side contract
    exact.crossJoin(broadcast(hllEst)).crossJoin(broadcast(kmv))
  }

  /** Engine-portable count-min sketch: `depth` md5-derived hash rows ×
    * `width` buckets; a key's estimate is the MIN of its bucket counts
    * across rows, always ≥ the exact count (structural overestimate,
    * asserted in AggregatesSpec). Emits the top-`k` exact heavy keys
    * with exact and CMS counts side by side — all integers, so the
    * DuckDB oracle replays the table bit-exactly. One shuffle on
    * (row, bucket) — depth·width cells regardless of input size.
    */
  def cmsHeavyKeysPortable(df: DataFrame, keyCol: String,
                           depth: Int = 4, width: Int = 256,
                           k: Int = 5): DataFrame =
    cmsProbeTopK(cmsCells(df, keyCol, depth, width), df, keyCol,
      depth, width, k)

  /** CMS bucket of `key` under hash row `hrow`: first 2 md5-hex chars
    * of "hrow:key" mod width — the portable hash the a20c/st12 oracles
    * recompute.
    */
  def cmsBucket(hrow: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(hrow.cast("string"), lit(":"),
      key).cast("binary")), 1, 2), 16, 10).cast("int"), lit(width))

  /** The CMS cell table (hrow, bucket, c) — a plain grouped count, so
    * it runs unchanged over a STREAMING frame in complete mode: the
    * sketch state is depth·width rows no matter how many events flow,
    * which is the whole point of maintaining it in a stream (exact
    * per-key counting = unbounded state). Mergeable by construction
    * (counts sum), null keys dropped.
    */
  def cmsCells(df: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 256): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("hrow"),
        col(keyCol).cast("string").as("k"))
      .select(col("hrow"), cmsBucket(col("hrow"), col("k"), width).as("bucket"))
      .groupBy(col("hrow"), col("bucket")).agg(count(lit(1)).as("c"))

  /** Probe finish: the top-`k` exact heavy keys of `df` with their CMS
    * estimates read out of `cells` (min across hash rows) — exact and
    * sketched counts side by side, the min-guarantee audit table.
    */
  def cmsProbeTopK(cells: DataFrame, df: DataFrame, keyCol: String,
                   depth: Int = 4, width: Int = 256,
                   k: Int = 5): DataFrame = {
    val rows = df.filter(col(keyCol).isNotNull)
    val top = rows.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("key").asc).limit(k)
    val probes = top
      .select(col("key"), col("n_exact"),
        explode(sequence(lit(0), lit(depth - 1))).as("hrow"))
      .withColumn("bucket", cmsBucket(col("hrow"), col("key"), width))
    probes.join(broadcast(cells), Seq("hrow", "bucket"))
      .groupBy(col("key"), col("n_exact"))
      .agg(min(col("c")).as("n_cms"))
      .orderBy(col("n_exact").desc, col("key").asc)
  }

  /** Gini coefficient per group with an EXACT INTEGER numerator — the
    * full inequality curve summary next to [[topShare]]'s single
    * point: G = Σ_{i<j}(x_(j) − x_(i)) / (n·Σx). The pairwise-
    * difference sum needs no pairs and no sort window: over the
    * distinct-cents histogram, each value v contributes
    * cnt_v · (v·cntBelow − sumBelow) (equal values contribute 0), with
    * the strictly-below cumulative count/sum from one ascending
    * [[bucketedPrefixSums]] pass — so the numerator is a plain integer
    * and only the final ratio is a double (6dp).
    *
    * Output: (grp, n, total_cents, s_num, gini).
    */
  def gini(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"),
        round(col(valueCol) * 100).cast("long").as("c"))
    val h = rows.groupBy(col("grp"), col("c")).agg(count(lit(1)).as("cnt"))
      .withColumn("w", col("c") * col("cnt"))
    val hc = bucketedPrefixSums(h, "c", ascending = true,
      Seq("cnt", "w"), groupCols = Seq("grp"))
    hc.withColumn("contrib",
        col("cnt") * (col("c") * (col("cum_cnt") - col("cnt"))
          - (col("cum_w") - col("w"))))
      .groupBy(col("grp"))
      .agg(sum(col("cnt")).as("n"), sum(col("w")).as("total_cents"),
        sum(col("contrib")).as("s_num"))
      .withColumn("gini",
        round(col("s_num").cast("double")
          / (col("n").cast("double") * col("total_cents").cast("double")),
          6))
  }

  /** Two-proportion A/B significance screen: the 2×2 contingency
    * table (variant × converted) with its chi-square statistic — the
    * experimentation readout every product pipeline ships. Counts are
    * integers; expected cells and the statistic are ratios/sums of
    * integer products spelled identically in the oracle (6dp round on
    * the single emitted double). One aggregation pass (conditional
    * sums), no pivot, no second scan.
    */
  def abTest(df: DataFrame, variantCol: String,
             convertedCol: String): DataFrame = {
    val v = col(variantCol)
    val c = col(convertedCol)
    abTestFromCounts(df.agg(
      sum(when(v === 0 && c === 0, 1L).otherwise(0L)).as("a0n"),
      sum(when(v === 0 && c === 1, 1L).otherwise(0L)).as("a0y"),
      sum(when(v === 1 && c === 0, 1L).otherwise(0L)).as("a1n"),
      sum(when(v === 1 && c === 1, 1L).otherwise(0L)).as("a1y")))
  }

  /** [[abTest]]'s χ² collapse exposed for pre-aggregated inputs — the
    * streaming twin (st21) maintains the 2×2 cell counts as bounded
    * complete-mode state and feeds them here, so stream and batch
    * share one arithmetic spelling. `base` must be one row with
    * columns a0n, a0y, a1n, a1y.
    */
  def abTestFromCounts(base: DataFrame): DataFrame = {
    val n = col("a0n") + col("a0y") + col("a1n") + col("a1y")
    def cell(obs: Column, rowTot: Column, colTot: Column): Column = {
      val e = rowTot.cast("double") * colTot.cast("double") /
        n.cast("double")
      (obs.cast("double") - e) * (obs.cast("double") - e) / e
    }
    val r0 = col("a0n") + col("a0y")
    val r1 = col("a1n") + col("a1y")
    val cn = col("a0n") + col("a1n")
    val cy = col("a0y") + col("a1y")
    base.select(col("a0n"), col("a0y"), col("a1n"), col("a1y"),
      round(cell(col("a0n"), r0, cn) + cell(col("a0y"), r0, cy)
        + cell(col("a1n"), r1, cn) + cell(col("a1y"), r1, cy), 6)
        .as("chi2"))
  }

  /** Concentration-of-value report per group: the share of total
    * value held by the top pctNum/pctDen fraction of rows (the
    * "top 1% of transactions carry X% of spend" screen — spend
    * concentration is itself a fraud/abuse signal, and the table is
    * the integer-exact cousin of a Gini curve point).
    *
    * All-integer on cents and the first-rank discipline: k =
    * ⌈n·pct⌉ rows per group; the threshold value t is the largest
    * cents with descending cumulative count ≥ k, and the top sum is
    * Σ_{c>t} c·cnt + (k − count_{>t})·t — ties at the threshold take
    * exactly as many rows as k needs, deterministically. Windowless
    * ([[bucketedPrefixSums]] descending with both count and weighted
    * prefix columns).
    *
    * Output: (grp, n, total_cents, k, top_cents).
    */
  def topShare(df: DataFrame, valueCol: String, groupCol: String,
               pctNum: Int = 1, pctDen: Int = 100): DataFrame = {
    require(pctNum > 0 && pctDen > 0 && pctNum <= pctDen,
      s"share must be a rational in (0,1]: got $pctNum/$pctDen")
    val rows = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"),
        round(col(valueCol) * 100).cast("long").as("c"))
    val h = rows.groupBy(col("grp"), col("c")).agg(count(lit(1)).as("cnt"))
      .withColumn("w", col("c") * col("cnt"))
    val hc = bucketedPrefixSums(h, "c", ascending = false,
      Seq("cnt", "w"), groupCols = Seq("grp"))
    val ng = h.groupBy(col("grp").as("g2"))
      .agg(sum(col("cnt")).as("n"), sum(col("w")).as("total_cents"))
    val withK = hc.join(ng, col("grp") <=> col("g2"))
      .withColumn("k",
        expr(s"(n * $pctNum + ($pctDen - 1)) div $pctDen"))
    withK.filter(col("cum_cnt") >= col("k"))
      .groupBy(col("grp"), col("n"), col("total_cents"), col("k"))
      .agg(max_by(
        struct(col("cum_cnt"), col("cnt"), col("cum_w"), col("w"),
          col("c")), col("c")).as("t"))
      .select(col("grp"), col("n"), col("total_cents"), col("k"),
        ((col("t.cum_w") - col("t.w"))
          + (col("k") - (col("t.cum_cnt") - col("t.cnt"))) * col("t.c"))
          .as("top_cents"))
  }

  /** Cross-group QUANTILE NORMALIZATION — the distribution-matching
    * transform (microarray heritage, now reward/score normalization):
    * every group's values map onto the POOLED distribution at the
    * same relative rank, so between-group scale/shape differences
    * vanish while within-group order is preserved.
    *
    * Entirely on integer rank rules (the w08 discipline — no
    * percentile interpolation anywhere): a row with peer-inclusive
    * within-group rank r (ties share a rank; no arbitrary tie-break
    * needed) maps to the global ⌈r·N/n_g⌉-th smallest value, read
    * out by the first-rank rule (min v with global cum ≥ p).
    *
    * Windowless: within-group and global cumulative counts via
    * [[bucketedPrefixSums]]; the lookup is a theta-join against the
    * broadcast global DISTINCT-VALUE frame — the quantized-column
    * contract (distinct values ≪ rows; a continuous column would make
    * that frame corpus-sized, w08's documented boundary).
    *
    * Returns the MAPPING frame (grp, v, n, norm), distinct-value
    * sized; join it back to rows for row-level normalization.
    */
  def quantileNormalize(df: DataFrame, valueCol: String,
                        groupCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("grp"),
      col(valueCol).as("v"))
    val h = rows.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cnt"))
    val hc = bucketedPrefixSums(h, "v", ascending = true, Seq("cnt"),
      groupCols = Seq("grp"))
    val ng = h.groupBy(col("grp").as("g2")).agg(sum(col("cnt")).as("n_g"))
    val gh = rows.groupBy(col("v").as("gv")).agg(count(lit(1)).as("gcnt"))
    val gc = bucketedPrefixSums(gh, "gv", ascending = true, Seq("gcnt"))
      .select(col("gv"), col("cum_gcnt"))
    val tot = rows.agg(count(lit(1)).as("n"))
    val p = hc.join(ng, col("grp") <=> col("g2"))
      .crossJoin(broadcast(tot))
      .select(col("grp"), col("v"), col("cnt"),
        expr("(cum_cnt * n + n_g - 1) div n_g").as("p"))
    p.join(broadcast(gc), col("cum_gcnt") >= col("p"))
      .groupBy(col("grp"), col("v"), col("cnt"))
      .agg(min(col("gv")).as("norm"))
      .select(col("grp"), col("v"), col("cnt").as("n"), col("norm"))
  }

  /** Benford's-law first-digit profile per group — the forensic
    * accounting screen (fabricated amounts over-sample mid digits;
    * organic multiplicative processes follow P(d) = log10(1 + 1/d)).
    * Returns per (grp, digit): observed count, expected count, and the
    * digit's χ² contribution (obs − exp)²/exp.
    *
    * Digit extraction is STRING-based on integer cents — `log10` on
    * the raw double would mis-floor at power-of-ten boundaries
    * (log10(100.0) can evaluate fractionally below 2), while the first
    * character of a BIGINT's decimal rendering is exact in every
    * engine. The only transcendental is the 9-constant expected-share
    * table, identical in both engines' ln; χ² contributions round 6dp.
    * One grouped count over (grp, digit) — scan-local digit compute,
    * 9 rows per group out.
    */
  def benfordProfile(df: DataFrame, valueCol: String,
                     groupCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    // gate on the ROUNDED cents, not the raw value: a value in
    // (0, 0.005) rounds to 0 cents, whose "first digit" 0 would put
    // log10(1 + 1/0) = ∞ into the expected-share table
    val counts = df
      .filter(col(valueCol).isNotNull && cents >= 1)
      .select(col(groupCol).as("grp"), digit.as("digit"))
      .groupBy(col("grp"), col("digit"))
      .agg(count(lit(1)).as("obs"))
    val tot = counts.groupBy(col("grp").as("gt")).agg(sum(col("obs")).as("n"))
    counts.join(broadcast(tot), col("grp") === col("gt"))
      .withColumn("expected",
        col("n").cast("double")
          * (log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
            / log(lit(10.0))))
      .select(col("grp"), col("digit"), col("obs"),
        round(col("expected"), 6).as("expected"),
        round((col("obs").cast("double") - col("expected"))
          * (col("obs").cast("double") - col("expected"))
          / col("expected"), 6).as("chi2_part"))
  }

  /** Quantile read-out from a (grp, bucket, c) equal-width histogram:
    * for each q in `qs` (percent), the FIRST bucket whose cumulative
    * count reaches ceil(q·N/100) — the integer first-rank rule (w07
    * discipline, no interpolation), stated as `cum·100 ≥ N·q` so both
    * engines compare integers. The histogram is sketch-sized (buckets
    * × groups, never data-sized), so the cumulative triangle join is
    * O(nb²) per group on a tiny frame — the batch-side collapse of
    * the st13 STREAMING histogram, whose state stays bounded no
    * matter how many events flow.
    */
  def histogramQuantiles(hist: DataFrame, qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      "quantiles are integer percents in [1, 100]")
    // rename-based self-joins: a memory-sink view read three times
    // carries identical attribute ids, so alias-qualified columns
    // ("a.grp") fail to resolve — renamed columns cannot collide
    val tot = hist.groupBy(col("grp").as("gt")).agg(sum(col("c")).as("n"))
    val lhs = hist.select(col("grp"), col("bucket"))
    val rhs = hist.select(col("grp").as("g2"), col("bucket").as("b2"),
      col("c").as("c2"))
    val cum = lhs.join(rhs,
        col("grp") === col("g2") && col("b2") <= col("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(sum(col("c2")).as("cum"))
    val joined = cum.join(broadcast(tot), col("grp") === col("gt"))
    qs.map { q =>
      joined.filter(col("cum") * 100 >= col("n") * q)
        .groupBy(col("grp")).agg(min(col("bucket")).as("bucket"))
        .withColumn("q", lit(q))
    }.reduce(_ unionByName _).select(col("grp"), col("q"), col("bucket"))
  }

  /** Per-group z-score column WITHOUT a window: one grouped pass
    * collects exact decimal moment sums (count, Σx, Σx²), the tiny
    * per-group frame broadcasts back onto the rows, and the z column is
    * plain arithmetic — so the normalization is two narrow shuffles at
    * any group cardinality instead of a per-group sort window, and the
    * doubles are reproducible across engines (exact decimal sums cast
    * once, then one fixed formula). Sample std (n−1); z is null for
    * groups with fewer than 2 rows or zero variance.
    *
    * `momentType` controls the partial-sum arithmetic. The default
    * `decimal(18,2)` QUANTIZES values to 2 decimal places before the
    * moment sums (z still subtracts the quantized mean from the RAW
    * value) and bounds |value| ≲ 10^16 before Σx² overflows to null —
    * right for money/quantity columns and for oracle parity (w05), wrong
    * for high-precision columns like probabilities. For those pass a
    * wider scale (e.g. `"decimal(28,12)"`) to keep exactness, or
    * `"double"` for full-precision moments at the cost of
    * partition-order-dependent last-ulp nondeterminism.
    */
  def zscorePerGroup(df: DataFrame, groupCol: String, valueCol: String,
                     zCol: String = "z",
                     momentType: String = "decimal(18,2)"): DataFrame = {
    val d = col(valueCol).cast(momentType)
    val moments = df.groupBy(col(groupCol).as("__g")).agg(
      count(lit(1)).as("__n"),
      sum(d).cast("double").as("__s"),
      sum(d * d).cast("double").as("__s2"))
    val mean = col("__s") / col("__n")
    val variance = (col("__s2") - col("__s") * col("__s") / col("__n")) /
      (col("__n") - 1)
    val stats = moments.select(col("__g"), col("__n"), mean.as("__mean"),
      sqrt(variance).as("__std"))
    // null-safe: a null group is a real group and its rows must keep
    // their (null-group) moments instead of being dropped
    df.join(broadcast(stats), col(groupCol) <=> col("__g"))
      .withColumn(zCol,
        when(col("__n") >= 2 && col("__std") > 0,
          (col(valueCol) - col("__mean")) / col("__std")))
      .drop("__g", "__n", "__s", "__s2", "__mean", "__std")
  }

  /** Robust per-group z-score via median/MAD — the heavy-tail-safe
    * companion to [[zscorePerGroup]] (web-scale quality scores are
    * exactly the columns whose mean/std a single spam document can
    * drag). `z = 0.6745 · (v − median) / MAD` (Iglewicz–Hoaglin
    * modified z-score; |z| > 3.5 is the classic outlier cut), null
    * when the group's MAD is 0. Both the median and the MAD are
    * lower medians — integer-exact rank rules, so every produced
    * double is bit-exactly reproducible (subtract/divide of exact
    * inputs, no percentile interpolation, no transcendental). Values
    * are cast to double up front (the subtraction in the MAD already
    * forced this arithmetically; now the stats schema says so too).
    *
    * Shape: the raw frame aggregates ONCE into a (group, value,
    * count) histogram — map-side combined, the shuffle carries
    * distinct values, never rows. The histogram is bounded by the
    * QUANTIZED-COLUMN contract (on a continuous column distinct ≈
    * rows; that case belongs to [[robustZscorePerGroupApprox]]), so
    * each group's sorted histogram fits one aggregation buffer and
    * BOTH rank selections — the median over values and the MAD over
    * the derived |v − med| histogram — evaluate as sequential
    * `aggregate()` folds inside ONE job, no second shuffle of data,
    * no window anywhere. The per-group stats stay a DATAFRAME
    * end-to-end (never a driver collect, never a literal relation —
    * at per-entity grouping 100 TB means millions of groups) and
    * broadcast-join back onto the raw rows, so the returned frame is
    * a plain scan + ONE broadcast hash join whose build side is the
    * stats aggregation. `keepStats = true` retains `robust_med` /
    * `robust_mad`.
    */
  def robustZscorePerGroupCached(df: DataFrame, groupCol: String,
                                 valueCol: String,
                                 zCol: String = "robust_z",
                                 keepStats: Boolean = false): Cached = {
    // persisted so repeated actions on the scored frame run the
    // stats aggregation once; release() drops it
    val statsP = robustStats(df, groupCol, valueCol).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = scoreWithStats(df, groupCol, valueCol, zCol, keepStats,
      statsP)
    Cached(out, Seq(statsP))
  }

  /** [[robustZscorePerGroupCached]] without the persist — the stats
    * frame is computed inside the scoring plan's broadcast exchange
    * (once per action), so there is nothing to release.
    */
  def robustZscorePerGroup(df: DataFrame, groupCol: String,
                           valueCol: String, zCol: String = "robust_z",
                           keepStats: Boolean = false): DataFrame =
    scoreWithStats(df, groupCol, valueCol, zCol, keepStats,
      robustStats(df, groupCol, valueCol))

  /** `(__mg, __med, __mad)` per group — the exact lower-median /
    * lower-MAD stats frame behind [[robustZscorePerGroup]]. */
  private def robustStats(df: DataFrame, groupCol: String,
                          valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    // per-group sorted histogram; struct order = (value, count), so
    // sort_array orders by value (count never splits a value: the
    // groupBy above already merged duplicates)
    val hist = counts.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("__v"), col("__cnt"))))
        .as("__h"))
    hist
      .withColumn("__N",
        aggregate(col("__h"), lit(0L), (a, x) => a + x("__cnt")))
      .withColumn("__target", expr("(__N + 1) div 2"))
      .withColumn("__med",
        lowerMedianOfHistArray(col("__h"), col("__target")))
      // the deviation histogram derives in-row: |v − med| re-sorted
      // (equal deviations need not merge — rank selection crosses the
      // same value either way)
      .withColumn("__mad", lowerMedianOfHistArray(
        array_sort(transform(col("__h"), x => struct(
          abs(x("__v") - col("__med")).as("__v"),
          x("__cnt").as("__cnt")))),
        col("__target")))
      .select(col(groupCol).as("__mg"), col("__med"), col("__mad"))
  }

  /** Lower median of a sorted (__v, __cnt) histogram array: smallest
    * value whose cumulative count reaches target — one sequential fold.
    */
  private def lowerMedianOfHistArray(arr: Column,
                                     target: Column): Column =
    aggregate(arr,
      struct(lit(0L).as("c"), lit(null).cast("double").as("m")),
      (acc, x) => struct(
        (acc("c") + x("__cnt")).as("c"),
        coalesce(acc("m"),
          when(acc("c") + x("__cnt") >= target, x("__v"))).as("m")),
      acc => acc("m"))

  /** Bounded-memory twin of [[robustZscorePerGroup]] — the 100-TB path
    * for CONTINUOUS value columns, mirroring `winsorize(approx = true)`.
    *
    * The exact path's (group, value, count) frame is only bounded when
    * values are quantized; on a continuous double column distinct ≈
    * rows and the exact-median shuffle carries the corpus. Here both
    * the median and the MAD come from `percentile_approx` — a mergeable
    * constant-size sketch per group, map-side partials, no
    * distinct-value frame anywhere — so memory is O(groups × accuracy)
    * regardless of row count, and the whole stats phase is TWO light
    * aggregation jobs (median, then deviation median) instead of four.
    *
    * Contract difference (spec-pinned, same stance as winsorize): the
    * returned median/MAD are actual data values whose rank is within
    * n/`accuracy` of the true median — EQUAL to the exact lower median
    * whenever the group has <= `accuracy` rows with a unique median
    * rank, drifting by at most that rank bound beyond. z-scores follow
    * the same Iglewicz–Hoaglin formula, null when MAD is 0.
    */
  def robustZscorePerGroupApprox(df: DataFrame, groupCol: String,
                                 valueCol: String,
                                 zCol: String = "robust_z",
                                 keepStats: Boolean = false,
                                 accuracy: Int = 10000): DataFrame = {
    val vals = df.filter(col(valueCol).isNotNull)
    // the median frame is never collected: the MAD pass
    // broadcast-joins it back onto the raw rows, and the median rides
    // through that aggregation (max of a per-group constant) so the
    // stats frame needs no second reference to `med` — everything is
    // executor-side, group cardinality unbounded
    val med = vals.groupBy(col(groupCol).as("__jg"))
      .agg(percentile_approx(col(valueCol), lit(0.5), lit(accuracy))
        .as("__m"))
    val stats = vals
      .join(broadcast(med), col(groupCol) <=> col("__jg"))
      .groupBy(col(groupCol).as("__mg"))
      .agg(max(col("__m")).as("__med"),
        percentile_approx(abs(col(valueCol) - col("__m")),
          lit(0.5), lit(accuracy)).as("__mad"))
    scoreWithStats(df, groupCol, valueCol, zCol, keepStats, stats)
  }

  /** Shared tail of the exact/approx robust z-score: broadcast-join
    * the per-group stats frame `(__mg, __med, __mad)` onto the raw
    * rows and score. The stats frame is a DataFrame, never driver
    * rows — group cardinality is unbounded.
    */
  private def scoreWithStats(df: DataFrame, groupCol: String,
                             valueCol: String, zCol: String,
                             keepStats: Boolean,
                             stats: DataFrame): DataFrame = {
    val scored = df.join(broadcast(stats), col(groupCol) <=> col("__mg"))
      .drop("__mg")
      .withColumn(zCol,
        when(col("__mad") > 0,
          lit(0.6745) * (col(valueCol) - col("__med")) / col("__mad")))
    if (keepStats)
      scored.withColumnRenamed("__med", "robust_med")
        .withColumnRenamed("__mad", "robust_mad")
    else scored.drop("__med", "__mad")
  }

  /** Per-group winsorization: clip `valueCol` into its own group's
    * [pLo, pHi] interpolated-percentile band (outlier capping before
    * averaging/training — the standard robust-stats companion to
    * [[zscorePerGroup]]). Two passes, no window: one grouped exact
    * `percentile` aggregation (map-side partials), bounds broadcast back,
    * then a pure clip projection — group cardinality and group size are
    * both unbounded.
    *
    * `approx = true` is the 100-TB path: the bounds aggregation runs on
    * `approx_percentile` (a bounded-memory mergeable sketch) instead of
    * exact `percentile` (which buffers every group value). The plan
    * shape is identical; the CONTRACT differs and is spec-pinned:
    * exact mode interpolates between neighbors (fractional bounds on
    * integer data), approx mode returns an actual data value whose
    * rank is within n/`approxAccuracy` of the requested percentile.
    *
    * `integerBounds = true` rounds each bound to the nearest long before
    * clipping, so an integral value column stays integral end-to-end
    * (exact cross-engine arithmetic); leave false for real-valued
    * columns, where the clipped column is double.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double = 0.05, pHi: Double = 0.95,
                outCol: String = "w",
                integerBounds: Boolean = false,
                approx: Boolean = false,
                approxAccuracy: Int = 10000): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi,
      s"need 0 <= pLo <= pHi <= 1, got [$pLo, $pHi]")
    val b = (c: Column) => if (integerBounds) round(c).cast("long") else c
    val pct = (p: Double) =>
      if (approx) expr(s"approx_percentile($valueCol, $p, $approxAccuracy)")
      else expr(s"percentile($valueCol, $p)")
    val bounds = df.groupBy(col(groupCol).as("__g")).agg(
      b(pct(pLo)).as("__lo"),
      b(pct(pHi)).as("__hi"))
    // null-safe join: a null group is a real group (same stance as
    // zscorePerGroup) and must clip against its own bounds
    df.join(broadcast(bounds), col(groupCol) <=> col("__g"))
      .withColumn(outCol,
        greatest(least(col(valueCol), col("__hi")), col("__lo")))
      .drop("__g", "__lo", "__hi")
  }

  /** Two-sample Kolmogorov–Smirnov distance — the distribution-drift
    * monitor a scoring pipeline runs between a reference window and
    * live traffic (the reference re-reads its whole log per dashboard
    * tick instead, `FD/evaluation.py:102-104`; this is the bounded,
    * aggregated form of that comparison).
    *
    * D = max over distinct values v of |F_exp(v) − F_act(v)|, with
    * both ECDFs right-continuous step functions. Computed windowless:
    * groupBy(value) counts, then [[bucketedPrefixSums]] for the
    * cumulative counts — no global sort, no single-partition stage,
    * and the shuffled frame is the DISTINCT-value frame, not the
    * corpus. The comparison runs on the INTEGER numerator
    * |cumE·Nact − cumA·Nexp| (exact in long far past any realistic
    * sample), and the reported `ks` is one exact-integer division —
    * bit-stable across engines, no transcendental anywhere.
    *
    * Returns one row: (n_expected, n_actual, ks_num, ks) where
    * ks = ks_num / (n_expected · n_actual).
    */
  def ksDrift(expected: DataFrame, actual: DataFrame,
              valueCol: String): DataFrame = {
    val side = (d: DataFrame, a: Long, b: Long) =>
      d.select(col(valueCol).cast("double").as("v"),
        lit(a).as("ea"), lit(b).as("ab")).filter(col("v").isNotNull)
    val perV = side(expected, 1L, 0L).unionAll(side(actual, 0L, 1L))
      .groupBy(col("v"))
      .agg(sum(col("ea")).as("ca"), sum(col("ab")).as("cb"))
    val cum = bucketedPrefixSums(perV, "v", ascending = true,
      Seq("ca", "cb"))
    val tot = perV.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(tot))
      .agg(max(col("na")).as("n_expected"),
        max(col("nb")).as("n_actual"),
        max(abs(col("cum_ca") * col("nb") - col("cum_cb") * col("na")))
          .as("ks_num"))
      .withColumn("ks",
        col("ks_num") / (col("n_expected") * col("n_actual"))
          .cast("double"))
  }

  /** Population Stability Index over equal-width bins — the binned
    * drift companion to [[ksDrift]], the monitor fraud teams alarm on
    * (PSI > 0.2 ≙ retrain). Bin edges come from the EXPECTED side's
    * min/max (one tiny agg, broadcast into both binning projections);
    * actual-side values outside the range clamp to the edge bins.
    * Laplace add-1 smoothing keeps empty bins finite:
    * p_i = (nE_i + 1)/(NE + bins). Per-bin counts are exact integers;
    * the ln-bearing contribution is rounded to 9dp (the t09 stance:
    * ln is not correctly rounded, the last ulp may differ across
    * engines). At scale this is two scans + one `bins`-row agg.
    *
    * Returns one row per bin: (bin, n_expected, n_actual, psi_term)
    * — Σ psi_term is the PSI.
    */
  def psiDrift(expected: DataFrame, actual: DataFrame, valueCol: String,
               bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val edges = expected
      .agg(min(col(valueCol).cast("double")).as("__mn"),
        max(col(valueCol).cast("double")).as("__mx"))
    val binned = (d: DataFrame) =>
      d.select(col(valueCol).cast("double").as("v"))
        .filter(col("v").isNotNull)
        .crossJoin(broadcast(edges))
        .select(
          when(col("__mx") === col("__mn"), lit(0L))
            .otherwise(greatest(lit(0L), least(
              floor((col("v") - col("__mn")) /
                (col("__mx") - col("__mn")) * bins),
              lit(bins - 1L)))).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val e = binned(expected).withColumnRenamed("n", "n_expected")
    val a = binned(actual).withColumnRenamed("n", "n_actual")
      .withColumnRenamed("bin", "__abin")
    val byBin = e.join(a, col("bin") === col("__abin"), "full_outer")
      .select(coalesce(col("bin"), col("__abin")).as("bin"),
        coalesce(col("n_expected"), lit(0L)).as("n_expected"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"))
    val totals = byBin.agg(sum(col("n_expected")).as("ne"),
      sum(col("n_actual")).as("na"))
    byBin.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_expected"), col("n_actual"),
        round(
          ((col("n_expected") + 1) / (col("ne") + bins).cast("double") -
            (col("n_actual") + 1) / (col("na") + bins).cast("double")) *
            log(((col("n_expected") + 1) * (col("na") + bins)).cast("double") /
              ((col("n_actual") + 1) * (col("ne") + bins)).cast("double")),
          9).as("psi_term"))
  }

  /** Chi-square drift for a CATEGORICAL column — the third drift
    * monitor beside [[ksDrift]] (continuous) and [[psiDrift]] (binned):
    * a 2×C contingency of `catCol` across the expected and actual
    * frames, emitting one row per category with its observed counts
    * and its chi-square contribution `Σ_side (obs − exp)² / exp`
    * (expected from the margins). Terms are per-row and rounded to
    * 9dp so the output is deterministic regardless of aggregation
    * order; the caller sums them and compares against the χ²(C−1)
    * critical value. One grouped count per side + a broadcast totals
    * row — no shuffle wider than the category cardinality.
    */
  def chi2Drift(expected: DataFrame, actual: DataFrame,
                catCol: String): DataFrame = {
    val ce = expected.filter(col(catCol).isNotNull)
      .groupBy(col(catCol)).agg(count(lit(1)).as("n_expected"))
    val ca = actual.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("__acat")).agg(count(lit(1)).as("n_actual"))
    val byCat = ce.join(ca, col(catCol) === col("__acat"), "full_outer")
      .select(coalesce(col(catCol), col("__acat")).as(catCol),
        coalesce(col("n_expected"), lit(0L)).as("n_expected"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"))
    val totals = byCat.agg(sum(col("n_expected")).as("__ne"),
      sum(col("n_actual")).as("__na"))
    byCat.crossJoin(broadcast(totals))
      .select(col(catCol), col("n_expected"), col("n_actual"),
        round({
          val n = (col("__ne") + col("__na")).cast("double")
          val rt = (col("n_expected") + col("n_actual")).cast("double")
          val ee = rt * col("__ne") / n
          val ea = rt * col("__na") / n
          val de = col("n_expected") - ee
          val da = col("n_actual") - ea
          de * de / ee + da * da / ea
        }, 9).as("chi2_term"))
  }

  /** Runtime enforcement of the domain² pair-join contract shared by
    * [[kendallTauB]] and [[theilSen]]: both θ-join the (x, y) cell
    * histogram against itself, so cost is quadratic in the CELL count
    * — constant under row-count scale-up only when the columns are
    * integer-quantized (cents, buckets, grades — the a41/a46
    * contract). A continuous DOUBLE column silently makes cells ≈ rows
    * and the join rows². The doc line was the only guard until r10
    * (r9 verdict "what's wrong #2"); this counts the cells (one cheap
    * aggregate that eagerly pins an already-persisted histogram — the
    * materializeBounded discipline) and REFUSES to plan the quadratic
    * join past `maxCells`, the [[graft.ops.Layout]] `maxFrontier` /
    * `maxBucket` refusal pattern.
    */
  private def requireBoundedCells(cells: DataFrame, maxCells: Int,
                                  op: String): Unit = {
    require(maxCells >= 1, s"maxCells must be >= 1, got $maxCells")
    val n = cells.count()
    require(n <= maxCells,
      s"$op: $n distinct (x, y) cells exceeds maxCells=$maxCells. " +
        "The pairwise stage is quadratic in the CELL count, so these " +
        "ops contract on QUANTIZED bounded-domain columns (cast to " +
        "cents/buckets/grades first — the kendallTauB/theilSen " +
        "quantization contract); a continuous DOUBLE column makes " +
        "cells ~ rows and the join rows^2. Quantize the column, or " +
        "raise maxCells deliberately after costing cells^2/2 pairs.")
  }

  /** KENDALL'S τ-b — the tie-corrected rank correlation (Kendall 1945)
    * over two INTEGER-QUANTIZED ordinal columns: concordant minus
    * discordant pair counts, normalized by the tie-adjusted pair
    * totals. The monotone-association screen that Pearson ([[cramersV]]
    * covers the categorical case, [[Anomaly.olsPerGroup]] the linear
    * case) misses when the relationship is curved.
    *
    * Exact and domain-bounded: rows collapse to the (x, y) CELL
    * HISTOGRAM, concordant/discordant counts come from one cell-pair
    * θ-join (`a.x < b.x`, y compared both ways — cost |X|·|Y| squared,
    * independent of row count; the caller quantizes to keep domains
    * bounded, the same contract as [[equidepthBins]], enforced at
    * runtime by [[requireBoundedCells]] via `maxCells`), tie terms from
    * the marginals, and τ-b is one fixed-order double chain, 7dp.
    * Degenerate inputs (all ties on either axis) yield null.
    *
    * Output (one row): n, n_pairs, concordant, discordant, tau_b.
    */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String,
                  maxCells: Int = 8192): DataFrame =
    kendallTauBImpl(df, xCol, yCol, persist = false, maxCells).df

  /** [[kendallTauB]] with the cell histogram persisted (it feeds both
    * sides of the cell-pair θ-join and both marginals) and handed back
    * for release — the form the bench queries run. The plain form is
    * unhinted: leak-free, re-counting cells up to four times.
    */
  def kendallTauBCached(df: DataFrame, xCol: String, yCol: String,
                        maxCells: Int = 8192): Cached =
    kendallTauBImpl(df, xCol, yCol, persist = true, maxCells)

  private def kendallTauBImpl(df: DataFrame, xCol: String, yCol: String,
                              persist: Boolean, maxCells: Int): Cached = {
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .agg(count(lit(1)).as("__c"))
      .transform(d =>
        if (persist) d.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else d)
    requireBoundedCells(cells, maxCells, "kendallTauB")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // pair products and tie terms accumulate as DECIMAL(38,0): in
    // long they pass 2^63 around n ~ 4e9 rows (ANSI hard-fail) while
    // the oracle widens to HUGEINT; the int64 OUTPUT columns are the
    // true contract bound (n_pairs fits long up to n ~ 4.3e9)
    val pairAgg = cells.as("a").join(cells.as("b"),
        col("a.__x") < col("b.__x"))
      .agg(
        sum(when(col("a.__y") < col("b.__y"),
          col("a.__c").cast(dec38) * col("b.__c"))
          .otherwise(lit(0).cast(dec38))).as("__C"),
        sum(when(col("a.__y") > col("b.__y"),
          col("a.__c").cast(dec38) * col("b.__c"))
          .otherwise(lit(0).cast(dec38))).as("__D"))
    val xm = cells.groupBy(col("__x")).agg(sum(col("__c")).as("__nx"))
      .agg(sum(col("__nx")).as("__n"),
        sum(expr("CAST(__nx AS DECIMAL(38,0)) * (__nx - 1)"))
          .as("__tx2"))
    val ym = cells.groupBy(col("__y")).agg(sum(col("__c")).as("__ny"))
      .agg(sum(expr("CAST(__ny AS DECIMAL(38,0)) * (__ny - 1)"))
        .as("__ty2"))
    // doubled forms (n(n−1), nx(nx−1)) stay integral in decimal; the
    // halves are exact because each product is even
    val out = pairAgg.crossJoin(broadcast(xm)).crossJoin(broadcast(ym))
      .withColumn("__n02", expr("CAST(__n AS DECIMAL(38,0)) * (__n - 1)"))
      .select(col("__n").as("n"),
        expr("CAST(__n02 / 2 AS BIGINT)").as("n_pairs"),
        coalesce(col("__C"), lit(0)).cast("long").as("concordant"),
        coalesce(col("__D"), lit(0)).cast("long").as("discordant"),
        when(col("__n02") > col("__tx2") && col("__n02") > col("__ty2"),
          round(lit(2.0) * (coalesce(col("__C"), lit(0)) -
            coalesce(col("__D"), lit(0))).cast("double") /
            sqrt((col("__n02") - col("__tx2")).cast("double") *
              (col("__n02") - col("__ty2")).cast("double")), 7))
          .as("tau_b"))
    Cached(out, if (persist) Seq(cells) else Seq.empty)
  }

  /** WELCH'S t — the unequal-variance two-sample location test
    * statistic (Welch 1947), the correct default when two segments'
    * spends have different spreads (Student's pooled t silently
    * assumes equal variance). Reports the STATISTIC and the
    * Welch–Satterthwaite degrees of freedom; the p-value needs the
    * incomplete beta function and stays out of the oracle-exact
    * surface (callers look t up against their preferred tail table).
    *
    * One pass: conditional integer moment sums for both groups
    * (count, Σx, Σx² as DECIMAL(38,0) — `xCol` must be integer-valued:
    * cents, counts), then a single fixed-order double chain for the
    * unbiased variances, t, and dof, each 7dp-rounded. Groups with
    * fewer than 2 rows yield null t/dof.
    *
    * Scale shape: ONE map-side-combinable aggregation over the scan —
    * the cheapest possible two-sample test at any size.
    */
  def welchT(df: DataFrame, groupCol: String, xCol: String,
             groupA: String, groupB: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = col(xCol)
    // cast BEFORE the square: x*x in long overflows (ANSI hard-fail)
    // past ~3e9 while the oracle's HUGEINT product is exact
    def side(g: String, tag: String) = Seq(
      sum(when(col(groupCol) === g, 1L).otherwise(0L)).as(s"__n$tag"),
      sum(when(col(groupCol) === g, x).otherwise(0L).cast(dec38))
        .as(s"__s$tag"),
      sum(when(col(groupCol) === g, x.cast(dec38) * x.cast(dec38))
        .otherwise(lit(0).cast(dec38))).as(s"__q$tag"))
    val sides = side(groupA, "a") ++ side(groupB, "b")
    // when-guards, not bare division: ANSI mode hard-fails on a
    // zero/one-row group's n or n−1 denominator
    def m(tag: String) =
      when(col(s"__n$tag") >= 1,
        col(s"__s$tag").cast("double") / col(s"__n$tag").cast("double"))
    // unbiased: v = (Σx² − n·m²) / (n − 1)
    def v(tag: String) =
      when(col(s"__n$tag") >= 2,
        (col(s"__q$tag").cast("double") -
          col(s"__n$tag").cast("double") * col(s"__m$tag") *
            col(s"__m$tag")) /
          (col(s"__n$tag") - 1).cast("double"))
    df.filter(x.isNotNull &&
        (col(groupCol) === groupA || col(groupCol) === groupB))
      .agg(sides.head, sides.tail: _*)
      .withColumn("__ma", m("a")).withColumn("__mb", m("b"))
      .withColumn("__va", v("a")).withColumn("__vb", v("b"))
      .withColumn("__wa", col("__va") / col("__na").cast("double"))
      .withColumn("__wb", col("__vb") / col("__nb").cast("double"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        // 2dp, not 7: cents-scale means at ~1e7 exceed double's exact
        // range at 7dp and flake the hash (the u04 lesson)
        round(col("__ma"), 2).as("mean_a"),
        round(col("__mb"), 2).as("mean_b"),
        when(col("__na") >= 2 && col("__nb") >= 2,
          round((col("__ma") - col("__mb")) /
            sqrt(col("__wa") + col("__wb")), 7)).as("t"),
        when(col("__na") >= 2 && col("__nb") >= 2,
          round((col("__wa") + col("__wb")) * (col("__wa") + col("__wb"))
            / (col("__wa") * col("__wa") /
                (col("__na") - 1).cast("double")
              + col("__wb") * col("__wb") /
                (col("__nb") - 1).cast("double")), 7)).as("dof"))
  }

  /** CRAMÉR'S V — the general r×c categorical-association strength
    * that [[abTest]]'s 2×2 chi-square specializes: χ² over the full
    * contingency table of two categorical columns, normalized to
    * [0, 1] by `sqrt(χ² / (n · min(r−1, c−1)))`. The "are these two
    * labels related at all" screen (feature redundancy, leakage
    * detection) at any cardinality.
    *
    * Exactness: every cell/marginal is an integer count; expected
    * counts and χ² terms are one fixed-order double chain per OBSERVED
    * cell, decimal-summed after 7dp rounding so partition order cannot
    * smear the total (absent cells contribute obs=0 ⇒ term = e, and
    * Σe over absent cells = n − Σe(observed) — algebraically folded in
    * rather than materializing the dense table). Output rounds at 7dp.
    *
    * Scale shape: one (a, b) cell count, two marginal re-aggs joined
    * back on their key, a broadcast 1-row total — cost bounded by
    * DISTINCT label pairs, not rows. Output (one row): n, r, c, chi2,
    * v.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame =
    cramersVImpl(df, aCol, bCol, persist = false).df

  /** [[cramersV]] with the contingency cells persisted (they feed both
    * marginals, the shape frame, and the scored join) and handed back
    * for release — the form the bench queries run. The plain form is
    * unhinted: leak-free, re-counting cells up to four times.
    */
  def cramersVCached(df: DataFrame, aCol: String, bCol: String): Cached =
    cramersVImpl(df, aCol, bCol, persist = true)

  private def cramersVImpl(df: DataFrame, aCol: String, bCol: String,
                           persist: Boolean): Cached = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
      .transform(d =>
        if (persist) d.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else d)
    val rowTot = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__ra"))
    val colTot = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__cb"))
    val shape = cells.agg(sum(col("__o")).as("__n"),
      countDistinct(col("__a")).as("__r"),
      countDistinct(col("__b")).as("__c"))
    // per observed cell: (o−e)²/e − e; Σe over ALL cells is n, so
    // χ² = Σ_observed((o−e)²/e − e) + n without densifying the table
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("__n").cast("double")
    val term = (col("__o").cast("double") - e) *
      (col("__o").cast("double") - e) / e - e
    val out = cells
      .join(rowTot, Seq("__a")).join(colTot, Seq("__b"))
      .crossJoin(broadcast(shape))
      .select(col("__n"), col("__r"), col("__c"),
        round(term, 7).cast(org.apache.spark.sql.types.DecimalType(38, 7)).as("__t"))
      .groupBy(col("__n"), col("__r"), col("__c"))
      .agg(sum(col("__t")).cast("double").as("__s"))
      .select(col("__n").as("n"), col("__r").as("r"), col("__c").as("c"),
        round(col("__s") + col("__n").cast("double"), 6).as("chi2"),
        when(least(col("__r") - 1, col("__c") - 1) > 0,
          round(sqrt((col("__s") + col("__n").cast("double")) /
            (col("__n").cast("double") *
              least(col("__r") - 1, col("__c") - 1).cast("double"))), 7))
          .as("v"))
    Cached(out, if (persist) Seq(cells) else Seq.empty)
  }

  /** Equi-depth (quantile) binning: assign every row to one of `k`
    * equal-population bins of `valueCol` and report each bin's value
    * range and occupancy — the feature-bucketization complement to
    * [[psiDrift]]'s equal-width bins. A distinct value never splits
    * across bins: the whole value group takes the bin of its first
    * global rank, so a heavy value makes its bin oversized — that skew
    * is reported, not hidden (qcut's duplicates="drop" stance).
    *
    * Windowless and exact: ranks come from `groupBy(value)` counts +
    * [[bucketedPrefixSums]] (partition-parallel, no global sort), and
    * the bin decision `(first_rank - 1) * k div N` is pure integer
    * arithmetic — reproducible on any engine, no percentile
    * interpolation. The shuffle carries the distinct-value frame, not
    * the rows, so at 100 TB the cost is bounded by value cardinality.
    */
  def equidepthBins(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vals = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("__cnt"))
    val cum = bucketedPrefixSums(vals, valueCol, ascending = true,
      sumCols = Seq("__cnt"))
    val total = vals.agg(sum(col("__cnt")).as("__N"))
    cum.crossJoin(broadcast(total))
      .select(col(valueCol),
        col("__cnt"),
        expr(s"((cum___cnt - __cnt) * $k) div __N").as("bin"))
      .groupBy(col("bin"))
      .agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"),
        sum(col("__cnt")).as("n"))
  }

  /** A12: accuracy as a single aggregate (`FD/evaluation.py:145`). */
  def accuracy(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.agg((avg((col(labelCol) === col(predCol)).cast("double")) * 100)
      .as("accuracy"))

  /** A18: distinct-class count (`FD/evaluation.py:149`). */
  def distinctClasses(df: DataFrame, labelCol: String): Long =
    df.agg(countDistinct(col(labelCol))).first().getLong(0)

  /** MANN–WHITNEY U (Wilcoxon rank-sum) with the tie-corrected normal
    * approximation — the nonparametric complement of [[welchT]]: "do
    * the two groups' value DISTRIBUTIONS differ in location", no
    * normality assumption, robust to the heavy tails that make a
    * cents-spend t-test fragile.
    *
    * Layout: ranks come from the DISTINCT-VALUE histogram (the
    * [[kendallTauB]]/[[equidepthBins]] contract — cost ∝ value
    * cardinality, not rows), with the cumulative count computed by
    * [[bucketedPrefixSums]] so no single-partition window ever runs.
    * All rank arithmetic is DOUBLED-rank integers (lo+hi = 2·avgrank),
    * summed in DECIMAL(38,0) — exact at any count, no decimal division
    * anywhere — and the final z is one fixed-order double chain, 7dp:
    *
    *   U₁ = R₁ − n₁(n₁+1)/2,  z = (U₁ − n₁n₂/2) / σ,
    *   σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1)))
    *
    * Output (one row): n_a, n_b, u1 (exact .5 grid, 1dp), z (7dp,
    * null when a group is empty, n < 2, or every value ties).
    */
  /** SPEARMAN rank correlation ρ with tie midranks — the monotone-
    * association complement of [[kendallTauB]]: same question ("does y
    * rise with x"), but Pearson-on-ranks instead of pair concordance,
    * so it reads on the familiar [−1, 1] correlation scale and costs
    * one rank pass per variable instead of a cell-pair join.
    *
    * Layout: per-variable midranks come from the DISTINCT-VALUE
    * histogram (+[[bucketedPrefixSums]] — cost ∝ value cardinality, no
    * global window), carried as DOUBLED ranks lo+hi = 2·midrank so
    * they stay integers; the joint frame is the (x, y) PAIR histogram
    * (cost ∝ pair cardinality), each pair joined to both rank tables.
    * The five weighted moment sums accumulate as DECIMAL(38,0) — exact
    * while n·(2n)² stays under 10³⁸, i.e. to ~10¹² rows — and ρ is the
    * one fixed-order double chain [[Anomaly.stats2]] uses (doubling
    * both ranks scales covariance and both variances by 4, leaving ρ
    * untouched). Output (one row): n, rho (7dp, null when either
    * variable is constant).
    */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String): DataFrame =
    spearmanRhoImpl(df, xCol, yCol, persist = false).df

  /** [[spearmanRho]] with the pair histogram persisted (it feeds both
    * rank histograms AND the joint join) and handed back for release —
    * the form the bench queries run ([[kendallTauBCached]] stance).
    */
  def spearmanRhoCached(df: DataFrame, xCol: String,
                        yCol: String): Cached =
    spearmanRhoImpl(df, xCol, yCol, persist = true)

  private def spearmanRhoImpl(df: DataFrame, xCol: String, yCol: String,
                              persist: Boolean): Cached = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val pairs = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
      .transform(d =>
        if (persist) d.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else d)
    def ranks2(c: String): DataFrame = {
      val h = pairs.groupBy(col(c)).agg(sum(col("__c")).as("__t"))
      bucketedPrefixSums(h, c, ascending = true, Seq("__t"))
        // doubled midrank: lo + hi = (hi − t + 1) + hi
        .select(col(c), (col("cum___t") * 2 - col("__t") + 1).as(s"__r$c"))
    }
    val joined = pairs
      .join(ranks2("__x"), Seq("__x"))
      .join(ranks2("__y"), Seq("__y"))
    val cd = col("__c").cast(dec38)
    val rx = col("__r__x").cast(dec38)
    val ry = col("__r__y").cast(dec38)
    val agg = joined.agg(
      sum(col("__c")).as("__n"),
      sum(cd * rx).as("__sx"), sum(cd * ry).as("__sy"),
      sum(cd * rx * rx).as("__sxx"), sum(cd * ry * ry).as("__syy"),
      sum(cd * rx * ry).as("__sxy"))
    val out = agg
      .withColumn("__nd", col("__n").cast("double"))
      .withColumn("__mx", col("__sx").cast("double") / col("__nd"))
      .withColumn("__my", col("__sy").cast("double") / col("__nd"))
      .withColumn("__vx", col("__sxx").cast("double") / col("__nd") -
        col("__mx") * col("__mx"))
      .withColumn("__vy", col("__syy").cast("double") / col("__nd") -
        col("__my") * col("__my"))
      .withColumn("__cxy", col("__sxy").cast("double") / col("__nd") -
        col("__mx") * col("__my"))
      .select(col("__n").as("n"),
        when(col("__vx") > 0.0 && col("__vy") > 0.0,
          round(col("__cxy") / sqrt(col("__vx") * col("__vy")), 7))
          .as("rho"))
    Cached(out, if (persist) Seq(pairs) else Seq.empty)
  }

  def mannWhitneyU(df: DataFrame, groupCol: String, xCol: String,
                   groupA: String, groupB: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val h = df
      .filter(col(xCol).isNotNull &&
        (col(groupCol) === groupA || col(groupCol) === groupB))
      .groupBy(col(xCol).as("v"))
      .agg(count(lit(1)).as("t"),
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ta"))
    val ranked = bucketedPrefixSums(h, "v", ascending = true, Seq("t"))
      .withColumn("hi", col("cum_t"))
      .withColumn("lo", col("hi") - col("t") + 1)
    val agg = ranked.agg(
      sum(col("t")).as("n"),
      sum(col("ta")).as("na"),
      // doubled rank-sum of group A: ta · (lo + hi) — decimal, exact
      sum(col("ta").cast(dec38) * (col("lo") + col("hi")).cast(dec38))
        .as("r1x2"),
      // tie term Σ(t³ − t), decimal before the cube (welchT lesson)
      sum(col("t").cast(dec38) * col("t").cast(dec38) *
        col("t").cast(dec38) - col("t").cast(dec38)).as("ties"))
    agg
      .withColumn("nb", col("n") - col("na"))
      // U₁ from doubled ranks: (2R₁ − 2·n₁(n₁+1)/2) / 2, integer-exact
      .withColumn("u1d",
        (col("r1x2") - col("na").cast(dec38) *
          (col("na") + 1).cast(dec38)).cast("double") / 2.0)
      .withColumn("sig2",
        when(col("n") >= 2,
          col("na").cast("double") * col("nb").cast("double") / 12.0 *
            ((col("n") + 1).cast("double") -
              col("ties").cast("double") /
                (col("n").cast("double") * (col("n") - 1).cast("double")))))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        when(col("na") >= 1, round(col("u1d"), 1)).as("u1"),
        when(col("na") >= 1 && col("nb") >= 1 && col("sig2") > 0,
          round((col("u1d") -
            col("na").cast("double") * col("nb").cast("double") / 2.0) /
            sqrt(col("sig2")), 7)).as("z"))
  }

  /** THEIL–SEN robust regression (median of pairwise slopes; Sen 1968)
    * on the [[kendallTauB]] cell-histogram discipline — the trend fit
    * a single spend-spike cannot drag, where [[graft.ops.Anomaly]]'s
    * OLS moves with every outlier. Slopes are taken between DISTINCT
    * (x, y) cells weighted by count products (pair space = domain²,
    * not rows² — the columns must be bounded-domain, the a41
    * contract, enforced at runtime by [[requireBoundedCells]] via
    * `maxCells`); equal-x pairs carry no slope (the standard rule).
    *
    * Exactness: each slope is one IEEE division of exact integer
    * differences (bit-identical on any engine), the weighted LOWER
    * median (first value whose ascending cumulative weight reaches
    * ⌈W/2⌉ — the w08 integer rank rule, no interpolation) comes off
    * [[bucketedPrefixSums]] over the distinct-slope histogram, and the
    * intercept is the weighted lower median of 9dp-rounded residuals
    * y − slope·x over the same cells. No driver round-trip: the
    * 1-row slope frame re-enters by broadcast crossJoin.
    *
    * Output (one row): n, w_pairs, slope, intercept.
    */
  def theilSen(df: DataFrame, xCol: String, yCol: String,
               maxCells: Int = 8192): Cached = {
    require(maxCells >= 1, s"maxCells must be >= 1, got $maxCells")
    val spark = df.sparkSession
    val cellsDf = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .agg(count(lit(1)).as("__c"))
    // the quantization contract makes > maxCells an ERROR, not a
    // fallback — so inside the bound the whole pair/median chain is
    // ≤ maxCells² driver integer/double algebra (r13: the two
    // bucketedPrefixSums passes, three persists and ~10 jobs of the
    // frame pipeline replayed as exact JVM arithmetic; every double
    // op is the same IEEE expression, round9 is Spark's own
    // valueOf/HALF_UP, and group keys normalize -0.0 the way catalyst
    // does). AggregatesSpec pins the op's fixtures; the a46 oracle
    // pins end-to-end.
    val cells = Layout.collectBounded(cellsDf, maxCells.toLong) match {
      case Right(rows) =>
        rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      case Left(p) =>
        val n = p.count()
        require(n <= maxCells,
          s"theilSen: $n distinct (x, y) cells exceeds " +
            s"maxCells=$maxCells. " +
            "The pairwise stage is quadratic in the CELL count, so " +
            "these ops contract on QUANTIZED bounded-domain columns " +
            "(cast to cents/buckets/grades first — the " +
            "kendallTauB/theilSen quantization contract); a " +
            "continuous DOUBLE column makes cells ~ rows and the " +
            "join rows^2. Quantize the column, or raise maxCells " +
            "deliberately after costing cells^2/2 pairs.")
        Array.empty[(Long, Long, Long)] // unreachable
    }
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def r9(x: Double): Double =
      if (x.isNaN || x.isInfinite) x
      else JBD.valueOf(x).setScale(9, RM.HALF_UP).doubleValue()
    // catalyst groupBy normalizes -0.0 to 0.0
    def norm0(x: Double): Double = if (x == 0.0) 0.0 else x
    // weighted slopes over every x-distinct cell pair
    val slopes = scala.collection.mutable.HashMap.empty[Double, Long]
    var wTot = 0L
    var i = 0
    while (i < cells.length) {
      var j = 0
      while (j < cells.length) {
        val (ax, ay, ac) = cells(i)
        val (bx, by, bc) = cells(j)
        if (ax < bx) {
          val s = norm0((by - ay).toDouble / (bx - ax).toDouble)
          val w = ac * bc
          slopes(s) = slopes.getOrElse(s, 0L) + w
          wTot += w
        }
        j += 1
      }
      i += 1
    }
    // weighted lower median: smallest slope with cum >= (wtot+1) div 2
    val slopeOpt: Option[Double] =
      if (slopes.isEmpty) None
      else {
        val thr = (wTot + 1L) / 2L
        var cum = 0L
        slopes.toArray.sortBy(_._1)(Ordering.Double.TotalOrdering).collectFirst {
          case (s, w) if { cum += w; cum >= thr } => s
        }
      }
    // residual lower median at the fitted slope; a null slope makes
    // every residual null — ONE null group whose mass is n (the frame
    // pipeline's exact null propagation: n survives, intercept nulls)
    val out: org.apache.spark.sql.Row =
      if (cells.isEmpty)
        org.apache.spark.sql.Row(null, null, null, null)
      else {
        val nTot = cells.iterator.map(_._3).sum
        slopeOpt match {
          case None =>
            org.apache.spark.sql.Row(nTot, null, null, null)
          case Some(slope) =>
            val resid = scala.collection.mutable.HashMap
              .empty[Double, Long]
            cells.foreach { case (x, y, c) =>
              val r = r9(y.toDouble - slope * x.toDouble)
              resid(r) = resid.getOrElse(r, 0L) + c
            }
            val thr = (nTot + 1L) / 2L
            var cum = 0L
            val icept = resid.toArray.sortBy(_._1)(Ordering.Double.TotalOrdering).collectFirst {
              case (r, c) if { cum += c; cum >= thr } => r
            }.get
            org.apache.spark.sql.Row(nTot, wTot, slope, icept)
        }
      }
    import org.apache.spark.sql.types._
    val frame = spark.createDataFrame(
      java.util.Arrays.asList(out),
      StructType(Seq(StructField("n", LongType),
        StructField("w_pairs", LongType),
        StructField("slope", DoubleType),
        StructField("intercept", DoubleType))))
    Cached(frame, Seq.empty)
  }

  /** KRUSKAL–WALLIS H with tie correction — [[mannWhitneyU]] extended
    * past two groups: "do ANY of the k groups' value distributions
    * differ in location", the one-shot screen that replaces k·(k−1)/2
    * pairwise U tests (and their multiple-comparison inflation) when a
    * drift monitor watches many segments at once.
    *
    *   H = 12/(N(N+1)) · Σᵢ Rᵢ²/nᵢ − 3(N+1),
    *   H' = H / (1 − Σ(t³−t)/(N³−N))
    *
    * Layout: pooled midranks from the DISTINCT-VALUE histogram via
    * [[bucketedPrefixSums]] (the [[mannWhitneyU]] contract — cost ∝
    * value cardinality, no global window), per-(value, group) counts
    * joined back so every group's DOUBLED rank sum R2ᵢ = Σ c·(lo+hi)
    * accumulates as DECIMAL(38,0), exact. The per-group term
    * R2ᵢ²/(4nᵢ) is a fixed-order double chain on those exact integers
    * — bit-identical in any engine — cast to DECIMAL(38,7) so the
    * cross-group sum is order-free, and the final H/H' is one double
    * chain, 7dp. Output (one row): n, k, h (tie-corrected; null when
    * k < 2 or every value ties). Returns [[Cached]]: hg feeds perV and
    * perG, perV feeds ranked and ties — persisted so the source scan
    * and group-bys run once per consumer set (the theilSen/a46
    * multi-consumer discipline), handed back for release.
    */
  def kruskalWallisH(df: DataFrame, groupCol: String,
                     xCol: String): Cached = {
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val hg = df
      .filter(col(xCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(xCol).as("v"), col(groupCol).as("g"))
      .agg(count(lit(1)).as("c"))
      .persist(disk)
    val perV = hg.groupBy(col("v")).agg(sum(col("c")).as("t"))
      .persist(disk)
    val ranked = bucketedPrefixSums(perV, "v", ascending = true, Seq("t"))
      .withColumn("hi", col("cum_t"))
      .withColumn("lo", col("hi") - col("t") + 1)
      .select(col("v"), (col("lo") + col("hi")).as("r2"))
    val perG = hg.join(ranked, Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("ni"),
        sum(col("c").cast(dec38) * col("r2").cast(dec38)).as("r2i"))
      // R2ᵢ²/(4nᵢ): exact-integer inputs, one fixed-order double
      // chain, decimal-cast so the k-row sum below is order-free
      .withColumn("__z",
        round(col("r2i").cast("double") * col("r2i").cast("double") /
          (lit(4.0) * col("ni").cast("double")), 7)
          .cast(org.apache.spark.sql.types.DecimalType(38, 7)))
    val ties = perV.agg(
      sum(col("t").cast(dec38) * col("t").cast(dec38) *
        col("t").cast(dec38) - col("t").cast(dec38)).as("ties"))
    val agg = perG.agg(
      sum(col("ni")).as("n"), count(lit(1)).as("k"),
      sum(col("__z")).cast("double").as("s"))
    val out = agg.crossJoin(broadcast(ties))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("h",
        lit(12.0) / (col("nd") * (col("nd") + 1.0)) * col("s") -
          lit(3.0) * (col("nd") + 1.0))
      .withColumn("corr",
        lit(1.0) - col("ties").cast("double") /
          (col("nd") * col("nd") * col("nd") - col("nd")))
      .select(col("n"), col("k"),
        when(col("k") >= 2 && col("corr") > 0.0,
          round(col("h") / col("corr"), 7)).as("h"))
    Cached(out, Seq(hg, perV))
  }

  /** Per-group GINI COEFFICIENT of a nonnegative integer-valued column
    * (cents, counts) — the concentration screen: "do 1% of this
    * merchant's users carry 80% of the spend?" is an abuse/wash-trading
    * signal per the fraud lens, and "do 1% of the sources carry 80% of
    * the tokens?" is a corpus-diversity diagnostic per the training-
    * data lens.
    *
    * Exact, windowless: the column collapses to a per-group distinct-
    * value histogram, [[bucketedPrefixSums]] supplies cumulative counts
    * (no global window), and a run of c copies of value v occupying
    * ranks r+1..r+c contributes v·(c·r + c(c+1)/2) to the rank-weighted
    * sum T — ALL INTEGER as DECIMAL(38,0), so
    * G = 2T/(n·S) − (n+1)/n is one final double chain over exact
    * decimals (the a42/a44 midrank discipline applied to Lorenz
    * algebra).
    *
    * Negative inputs are refused (Gini's Lorenz construction assumes a
    * nonnegative distribution); all-zero groups yield null.
    *
    * Output per group: `(grp, n, total, gini)`, 7dp.
    *
    * Scale shape: one grouped histogram aggregation, the banded
    * prefix-sum join, one grouped finish — cost bounded by distinct
    * (group, value) cells, never a global sort.
    */
  def giniPerGroup(df: DataFrame, groupCol: String,
                   valueCol: String): DataFrame = {
    val rows = df.filter(col(groupCol).isNotNull &&
      col(valueCol).isNotNull)
    val hist = rows
      .groupBy(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    giniFromHist(hist)
  }

  /** The Lorenz algebra over ANY `(__g, __v, __c)` histogram frame —
    * factored (the n16b pattern) so a streaming complete-mode count
    * sink feeds the identical finish (st22); [[giniPerGroup]] is the
    * batch wrapper that builds the histogram from raw rows.
    */
  def giniFromHist(hist: DataFrame): DataFrame = {
    val cum = bucketedPrefixSums(hist, "__v", ascending = true,
      sumCols = Seq("__c"), groupCols = Seq("__g"))
    val vD = col("__v").cast("decimal(38,0)")
    val cD = col("__c").cast("decimal(38,0)")
    val rBefore = (col("cum___c") - col("__c")).cast("decimal(38,0)")
    // c(c+1) is even, so the triangular term is integer-exact on longs
    // (c ≤ group rows; c² < 2⁶³ up to 3·10⁹-row groups) — `div`, not
    // decimal `/`, which would introduce a fractional scale
    val half = expr("(__c * (__c + 1)) div 2").cast("decimal(38,0)")
    val contrib = vD * (cD * rBefore + half)
    cum.groupBy(col("__g").as("grp"))
      .agg(sum(col("__c")).as("__n"),
        sum(vD * cD).as("__s"),
        sum(contrib).as("__t"),
        min(col("__v")).as("__mnv"))
      .select(col("grp"), col("__n").cast("long").as("n"),
        col("__s").cast("long").as("total"),
        when(col("__mnv") < 0, lit(null).cast("double")).otherwise(
          when(col("__s") > 0,
            round(lit(2.0) * col("__t").cast("double") /
              (col("__n").cast("double") * col("__s").cast("double")) -
              (col("__n").cast("double") + lit(1.0)) /
                col("__n").cast("double"), 7))).as("gini"))
  }
}
