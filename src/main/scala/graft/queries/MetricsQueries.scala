package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Aggregates

/** Model-quality metric aggregates — SURVEY §2.4 A9, A11-A17 — computed by
  * the `graft.ops.Aggregates` library over a synthetic label/score derived
  * from lineitem columns (the operator semantics, not the fraud domain,
  * are what the oracle checks):
  *   label = (l_returnflag = 'R'), pred = (l_discount > 0.05),
  *   proba = l_discount * 9 + l_tax   (ties on purpose — exercises
  *   average-rank AUC and per-distinct-threshold PR-curve handling).
  */
object MetricsQueries extends QuerySet {

  private def scored(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        (col("l_returnflag") === "R").cast("int").as("label"),
        (col("l_discount") > 0.05).cast("int").as("pred"),
        (col("l_discount") * 9 + col("l_tax")).as("proba"))

  private val scoredSql =
    """SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
              CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS pred,
              l_discount * 9 + l_tax AS proba
       FROM lineitem"""

  /** Shared gate for the KLL sketch queries (a49 / st25): joins the
    * sketched per-group `(p, est)` estimates against the group's
    * EXACT value CDF, emits the exact type-1 quantile (oracle-
    * replayable) and the deterministic within-bound boolean. The
    * rank-error bound replays [[graft.functions.KllSketchAgg.rankErrorBound]]
    * in column algebra with `length(bin(n div k))` as the exact
    * integer ⌊log₂⌋+1 — no float log whose last ulp could flip a
    * floor between runs.
    */
  private[queries] def kllGate(sketched: DataFrame, raw: DataFrame,
                               capacity: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = raw.groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val cdf = h.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("grp"))
        .orderBy(col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ng = cdf.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    // pinned as a local relation: groups×percents rows, and BOTH the
    // exact-quantile branch and the bound-check branch read it — the
    // pin also sidesteps conflicting-reference resolution on the
    // est↔cdf self-join lattice
    val est = graft.ops.Layout.materializeBounded(
      sketched.select(col("grp"), explode(col("q")).as("e"))
        .select(col("grp"), col("e.p").as("p"), col("e.est").as("est"))
        .join(ng, Seq("grp"))
        .withColumn("target", greatest(lit(1L),
          expr("(CAST(p AS BIGINT) * n + 99) div 100")))
        .withColumn("bound", when(col("n") > capacity,
          expr(s"2 * length(bin(n div $capacity)) * n div $capacity"))
          .otherwise(lit(0L))),
      maxRows = 1000000L)
    val exact = est.select(col("grp"), col("p"), col("target"))
      .join(cdf.select(col("grp"), col("v"), col("cum")), Seq("grp"))
      .filter(col("cum") >= col("target"))
      .groupBy(col("grp"), col("p"))
      .agg(min(col("v")).as("exact_v"))
    val out = est
      .join(cdf.select(col("grp"), col("v").as("est"),
        col("cnt").as("ecnt"), col("cum").as("ecum")),
        Seq("grp", "est"))
      .withColumn("within_bound",
        (col("ecum") - col("ecnt") + 1 <= col("target") + col("bound")) &&
          (col("ecum") >= col("target") - col("bound")))
      .join(exact, Seq("grp", "p"))
      .select(col("grp").as("event_type"), col("p"), col("exact_v"),
        col("within_bound"))
      .orderBy(col("event_type"), col("p"))
    // materializeBounded is eager, so the CDF's blocks free here
    val pinned = graft.ops.Layout.materializeBounded(out,
      maxRows = 1000000L)
    cdf.unpersist(blocking = false)
    pinned
  }

  /** Shared gate for the Misra–Gries queries (a50 / st26): exact
    * per-group counts find the TRUE heavy hitters (c·(k+1) > n), a
    * left join against the sketch contents checks the two theorem
    * facts. Integer threshold algebra throughout.
    */
  private[queries] def hhGate(sketched: DataFrame, raw: DataFrame,
                              k: Int): DataFrame = {
    val counts = raw.groupBy(col("grp"), col("item"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ng = counts.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val sk = graft.ops.Layout.materializeBounded(
      sketched.select(col("grp"), explode(col("hh")).as("e"))
        .select(col("grp"), col("e.item").as("item"),
          col("e.est").as("est")),
      maxRows = 1000000L)
    val out = counts.join(ng, Seq("grp"))
      .filter(col("c") * (k + 1) > col("n"))
      .join(sk, Seq("grp", "item"), "left")
      .withColumn("retained", col("est").isNotNull)
      .withColumn("bound_ok", col("retained") &&
        col("est") <= col("c") &&
        (col("c") - col("est")) * (k + 1) <= col("n"))
      .select(col("grp").as("event_type"), col("item"),
        col("c").as("exact_c"), col("retained"), col("bound_ok"))
      .orderBy(col("event_type"), col("item"))
    val pinned = graft.ops.Layout.materializeBounded(out,
      maxRows = 1000000L)
    counts.unpersist(blocking = false)
    pinned
  }

  /** Shared gate for the AMS tug-of-war queries (a51 / st27): the
    * sketch's r counters are a LINEAR function of the exact item
    * counts, so the oracle recomputes every z_j from (item, c) pairs
    * with the same Mersenne-prime sign algebra
    * ([[graft.functions.AmsSketchAgg.sign]]) and the gate pins both
    * the exact F₂ and the full sketch estimate — integer end to end.
    * Long headroom: needs Σ z_j² ≤ r·n² < 2^63 per group (n ≲ 3.7e8
    * at r=64); past that the gate (not the sketch) moves to decimal.
    */
  private[queries] def amsGate(sketched: DataFrame, raw: DataFrame,
                               r: Int): DataFrame = {
    val ex = raw.groupBy(col("grp"), col("item"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("f2"))
    sketched
      .withColumn("sum_z2",
        expr("aggregate(z, 0L, (acc, x) -> acc + x * x)"))
      .join(ex, Seq("grp"))
      .select(col("grp").as("event_type"), col("n"),
        col("f2").as("f2_exact"), col("sum_z2"),
        abs(col("sum_z2") - lit(r.toLong) * col("f2")).as("abs_err_x_r"))
      .orderBy(col("event_type"))
  }

  private[queries] val amsOracleSql: String =
    """WITH r AS (SELECT event_type AS grp, user_id AS item FROM events
                  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       c AS (SELECT grp, item, COUNT(*) AS c FROM r GROUP BY 1, 2),
       ex AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n,
                CAST(SUM(c*c) AS BIGINT) AS f2 FROM c GROUP BY grp),
       js AS (SELECT j FROM range(0, 64) t(j)),
       z AS (SELECT grp, j,
               SUM(c * (CASE WHEN
                 2 * (((((2*j + 1) * 1103515245) % 2147483647) *
                       (((item % 2147483647) + 2147483647) % 2147483647) +
                       ((12345*j + 6789) % 2147483647)) % 2147483647)
                 < 2147483647 THEN 1 ELSE -1 END)) AS zj
             FROM c CROSS JOIN js GROUP BY 1, 2),
       sk AS (SELECT grp, CAST(SUM(zj*zj) AS BIGINT) AS sum_z2
              FROM z GROUP BY grp)
       SELECT ex.grp AS event_type, n, f2 AS f2_exact, sum_z2,
              ABS(sum_z2 - 64*f2) AS abs_err_x_r
       FROM ex JOIN sk ON ex.grp = sk.grp
       ORDER BY event_type"""

  private[queries] val hhOracleSql: String =
    """WITH r AS (SELECT event_type AS grp,
                    CASE WHEN user_id % 2 = 0 THEN user_id % 10
                         ELSE user_id END AS item
                  FROM events
                  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       c AS (SELECT grp, item, COUNT(*) AS c FROM r GROUP BY 1, 2),
       n AS (SELECT grp, SUM(c) AS n FROM c GROUP BY grp)
       SELECT c.grp AS event_type, CAST(c.item AS BIGINT) AS item,
              CAST(c.c AS BIGINT) AS exact_c,
              TRUE AS retained, TRUE AS bound_ok
       FROM c JOIN n ON c.grp = n.grp
       WHERE c.c * 65 > n.n
       ORDER BY event_type, item"""

  private[queries] val kllOracleSql: String =
    """WITH r AS (SELECT event_type AS grp, value AS v FROM events
                  WHERE value IS NOT NULL AND event_type IS NOT NULL),
       h AS (SELECT grp, v, COUNT(*) AS cnt FROM r GROUP BY 1, 2),
       c AS (SELECT grp, v, cnt,
               SUM(cnt) OVER (PARTITION BY grp ORDER BY v) AS cum
             FROM h),
       n AS (SELECT grp, SUM(cnt) AS n FROM h GROUP BY grp),
       p AS (SELECT * FROM (VALUES (10),(25),(50),(75),(90),(99))
             AS t(p)),
       tg AS (SELECT n.grp, p.p,
                GREATEST(1, (p.p * n.n + 99) // 100) AS target
              FROM n CROSS JOIN p),
       ex AS (SELECT tg.grp, tg.p, MIN(c.v) AS exact_v
              FROM tg JOIN c ON c.grp = tg.grp AND c.cum >= tg.target
              GROUP BY 1, 2)
       SELECT grp AS event_type, CAST(p AS INT) AS p, exact_v,
              TRUE AS within_bound
       FROM ex ORDER BY event_type, p"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A11-A14: accuracy %, weighted P/R/F1, specificity, FPR, FNR, MCC —
    // the full FD/model.py:131-146 battery from one confusion pass.
    "a11_metric_battery" -> ((s, d) =>
      Aggregates.binaryMetrics(
        Aggregates.confusionCounts(scored(s, d), "label", "pred"))),

    // A12: accuracy as a standalone single-pass aggregate.
    "a12_accuracy" -> ((s, d) =>
      Aggregates.accuracy(scored(s, d), "label", "pred")),

    // Cohen's kappa on the same label/pred pair: chance-corrected
    // agreement from the four confusion counts — the imbalance-aware
    // companion to a12's raw accuracy and a11's MCC.
    "a45_cohens_kappa" -> ((s, d) =>
      Aggregates.cohensKappa(
        Aggregates.confusionCounts(scored(s, d), "label", "pred"))),

    // Per-class classification-report rows (FD/model.py:136-139).
    "a11b_class_report" -> ((s, d) =>
      Aggregates.classReport(
        Aggregates.confusionCounts(scored(s, d), "label", "pred"))),

    // ROC curve point frame (FD/model.py:155-171).
    "a16b_roc_curve" -> ((s, d) =>
      Aggregates.rocCurve(scored(s, d), "label", "proba")),

    // PR curve point frame (FD/evaluation.py:91-95).
    "a17b_pr_curve" -> ((s, d) =>
      Aggregates.prCurve(scored(s, d), "label", "proba")),

    // A16: ROC AUC via rank-sum identity (sklearn tie semantics).
    "a16_roc_auc" -> ((s, d) =>
      Aggregates.rocAuc(scored(s, d), "label", "proba")),

    // A17: PR-curve optimal threshold + best F1.
    "a17_optimal_threshold" -> ((s, d) =>
      Aggregates.optimalThreshold(scored(s, d), "label", "proba")),

    // A15: log loss with sklearn eps clipping.
    "a15_log_loss" -> ((s, d) =>
      Aggregates.logLoss(scored(s, d), "label", "proba")),

    // Calibration: Brier + 10-bin ECE from one grouped pass; decimal
    // partial sums make both engine-exact.
    "a23_calibration" -> ((s, d) =>
      Aggregates.calibration(scored(s, d), "label", "proba", bins = 10)),

    // Two-sample KS drift between the click and purchase value
    // distributions — reference window vs live traffic. Windowless
    // ECDFs (bucketed prefix sums over the distinct-value frame); the
    // statistic compares as an exact integer numerator.
    "a24_ks_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Aggregates.ksDrift(
        ev.filter(col("event_type") === "click").select(col("value")),
        ev.filter(col("event_type") === "purchase").select(col("value")),
        "value")
    }),

    // PSI over 10 equal-width bins anchored on the expected side —
    // the binned drift monitor (alarm at PSI > 0.2). Per-bin counts
    // exact; the ln-bearing term rounds to 9dp (t09 stance).
    "a25_psi_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Aggregates.psiDrift(
        ev.filter(col("event_type") === "click").select(col("value")),
        ev.filter(col("event_type") === "purchase").select(col("value")),
        "value", bins = 10)
        .orderBy(col("bin"))
    }),

    // Equi-depth binning of the event value distribution — 8 equal-
    // population buckets with their value ranges, the quantile
    // counterpart of a25's equal-width bins. The bin rule is integer-
    // exact (first-rank arithmetic, no percentile interpolation).
    "a26_equidepth" -> ((s, d) =>
      Aggregates.equidepthBins(
        Tables.events(s, d).select(col("value")), "value", k = 8)
        .orderBy(col("bin"))),

    // Mergeable KLL-style quantile sketch over the per-type event
    // value distribution (r10 verdict mandate #7 — the streaming-
    // quantile gap: st13's histogram needs a known value domain, the
    // sketch does not). The gate is two-part and fully deterministic:
    // the EXACT type-1 quantiles (a26's integer rank rule, oracle-
    // replayed) ride along as columns, and the sketch estimate must
    // sit within the analytic worst-case rank-error bound of the
    // target rank (KllSketchAgg.rankErrorBound, computed engine-side
    // with integer bin()-length log2 so no float log boundary can
    // flip it; the oracle pins the boolean TRUE). Estimates
    // themselves are partition-order-dependent by nature — the BOUND
    // is the portable contract, KllSpec stress-tests it.
    "a49_kll_quantiles" -> ((s, d) => {
      val raw = Tables.events(s, d)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type").as("grp"),
          col("value").cast("double").as("v"))
      val sk = raw.groupBy(col("grp"))
        .agg(graft.functions.KllSketchAgg.kllQuantiles(
          col("v"), 512, Seq(10, 25, 50, 75, 90, 99)).as("q"))
      kllGate(sk, raw, capacity = 512)
    }),

    // Misra–Gries heavy hitters per event type (the frequency sibling
    // of a49's rank sketch; mergeable-summaries merge rule, so the
    // worst-case guarantee holds under any partition/merge order).
    // The item column plants 5 hot keys per group (even user_ids fold
    // to id%10) over a long distinct tail — the gate emits the TRUE
    // heavy hitters (exact counts, SQL-replayable) with the two
    // theorem booleans pinned: every item with c·(k+1) > n is
    // retained, and its estimate sits in [c − n/(k+1), c]. All
    // threshold arithmetic stays integer ((c−est)·(k+1) ≤ n), no
    // division to diverge on.
    // AMS F₂ sketch per event type — the MOMENT member of the
    // mergeable-sketch family (a49 rank, a50 frequency): 64 signed
    // tug-of-war counters whose merge is lossless vector addition, so
    // the streamed/partitioned fold is BIT-equal to the batch one, not
    // merely bound-preserving. The gate replays every counter from
    // exact counts in SQL (the sign hash is Mersenne-prime integer
    // algebra) and pins exact F₂ next to the sketch estimate — F₂ is
    // the key-concentration number behind self-join sizing and
    // repeated-key skew detection at 100 TB.
    "a51_ams_f2" -> ((s, d) => {
      val raw = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("event_type").as("grp"), col("user_id").as("item"))
      val sk = raw.groupBy(col("grp"))
        .agg(graft.functions.AmsSketchAgg.amsSketch(col("item"), 64).as("z"))
      amsGate(sk, raw, r = 64)
    }),

    "a50_heavy_hitters" -> ((s, d) => {
      val raw = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("event_type").as("grp"),
          expr("CASE WHEN user_id % 2 = 0 THEN user_id % 10 " +
            "ELSE user_id END").as("item"))
      val sk = raw.groupBy(col("grp"))
        .agg(graft.functions.HeavyHittersAgg.heavyHitters(
          col("item"), 64).as("hh"))
      hhGate(sk, raw, k = 64)
    }),

    // Chi-square drift on a categorical column: the language mix of
    // even- vs odd-id documents as a 2×C contingency, one chi² term
    // per language (9dp). Counts exact; terms deterministic per row.
    "a27_chi2_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Aggregates.chi2Drift(
        docs.filter(col("doc_id") % 2 === 0).select(col("lang")),
        docs.filter(col("doc_id") % 2 === 1).select(col("lang")),
        "lang")
        .orderBy(col("lang"))
    }),

    // Poisson-bootstrap sampling distribution of the per-type mean
    // event value: 32 deterministic md5-keyed replicates in ONE
    // weighted aggregate (shuffle carries groups × reps partials, not
    // data). The spread across reps is the standard error nobody
    // reports at 100 TB because the naive bootstrap can't run there.
    "a28_bootstrap" -> ((s, d) =>
      graft.ops.Bootstrap.bootMeans(
        Tables.events(s, d)
          .select(col("event_type"), col("event_id"), col("value")),
        "event_type", "event_id", "value", reps = 32)
        .orderBy(col("event_type"), col("rep")))
  )

  private val bootstrapSql: String = {
    val caseSum = graft.ops.Bootstrap.thresholdsHex
      .map(h => s"CASE WHEN k >= '$h' THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH r AS (SELECT unnest(range(32)) AS rep),
         e AS (SELECT event_type AS g, event_id AS id,
                      CAST(value AS DECIMAL(18,2)) AS v
               FROM events WHERE value IS NOT NULL),
         x AS (SELECT g, rep,
                      substr(md5(id::VARCHAR || ':' || rep::VARCHAR), 1, 8)
                        AS k, v
               FROM e CROSS JOIN r),
         wt AS (SELECT g, rep, v, $caseSum AS w FROM x),
         agg AS (SELECT g, rep, SUM(w) AS n_eff, SUM(w * v) AS wsum
                 FROM wt GROUP BY 1, 2)
       SELECT g AS event_type, rep, CAST(n_eff AS BIGINT) AS n_eff,
              CASE WHEN n_eff > 0 THEN CAST(wsum AS DOUBLE) / n_eff END
                AS boot_mean
       FROM agg ORDER BY event_type, rep"""
  }

  def oracle: Map[String, String] = Map(
    "a28_bootstrap" -> bootstrapSql,
    "a24_ks_drift" ->
      """WITH e AS (SELECT value AS v FROM events
                    WHERE event_type = 'click' AND value IS NOT NULL),
           a AS (SELECT value AS v FROM events
                 WHERE event_type = 'purchase' AND value IS NOT NULL),
           u AS (SELECT v, 1 AS ca, 0 AS cb FROM e
                 UNION ALL SELECT v, 0, 1 FROM a),
           perv AS (SELECT v, SUM(ca) AS ca, SUM(cb) AS cb
                    FROM u GROUP BY v),
           c AS (SELECT SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
                 FROM perv
                 WINDOW w AS (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM perv)
         SELECT CAST(na AS BIGINT) AS n_expected,
                CAST(nb AS BIGINT) AS n_actual,
                CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT) AS ks_num,
                CAST(MAX(ABS(cuma * nb - cumb * na)) AS DOUBLE)
                  / (na * nb) AS ks
         FROM c CROSS JOIN t GROUP BY na, nb""",
    "a25_psi_drift" ->
      """WITH e AS (SELECT value AS v FROM events
                    WHERE event_type = 'click' AND value IS NOT NULL),
           a AS (SELECT value AS v FROM events
                 WHERE event_type = 'purchase' AND value IS NOT NULL),
           edges AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM e),
           be AS (SELECT CASE WHEN mx = mn THEN 0
                    ELSE GREATEST(0, LEAST(
                      CAST(FLOOR((v - mn) / (mx - mn) * 10) AS BIGINT), 9))
                    END AS bin
                  FROM e CROSS JOIN edges),
           ba AS (SELECT CASE WHEN mx = mn THEN 0
                    ELSE GREATEST(0, LEAST(
                      CAST(FLOOR((v - mn) / (mx - mn) * 10) AS BIGINT), 9))
                    END AS bin
                  FROM a CROSS JOIN edges),
           ce AS (SELECT bin, COUNT(*) AS n_expected FROM be GROUP BY bin),
           ca AS (SELECT bin, COUNT(*) AS n_actual FROM ba GROUP BY bin),
           bb AS (SELECT COALESCE(ce.bin, ca.bin) AS bin,
                    COALESCE(n_expected, 0) AS n_expected,
                    COALESCE(n_actual, 0) AS n_actual
                  FROM ce FULL OUTER JOIN ca ON ce.bin = ca.bin),
           t AS (SELECT SUM(n_expected) AS ne, SUM(n_actual) AS na
                 FROM bb)
         SELECT bin, n_expected, n_actual,
                ROUND(((n_expected + 1) / CAST(ne + 10 AS DOUBLE) -
                       (n_actual + 1) / CAST(na + 10 AS DOUBLE)) *
                  ln(CAST((n_expected + 1) * (na + 10) AS DOUBLE) /
                     CAST((n_actual + 1) * (ne + 10) AS DOUBLE)), 9)
                  AS psi_term
         FROM bb CROSS JOIN t ORDER BY bin""",
    "a27_chi2_drift" ->
      """WITH e AS (SELECT lang, COUNT(*) AS n_expected FROM documents
                    WHERE doc_id % 2 = 0 AND lang IS NOT NULL
                    GROUP BY lang),
           a AS (SELECT lang, COUNT(*) AS n_actual FROM documents
                 WHERE doc_id % 2 = 1 AND lang IS NOT NULL
                 GROUP BY lang),
           b AS (SELECT COALESCE(e.lang, a.lang) AS lang,
                   COALESCE(n_expected, 0) AS n_expected,
                   COALESCE(n_actual, 0) AS n_actual
                 FROM e FULL OUTER JOIN a ON e.lang = a.lang),
           t AS (SELECT SUM(n_expected) AS ne, SUM(n_actual) AS na
                 FROM b)
         SELECT lang, n_expected, n_actual,
                ROUND(
                  (n_expected - (n_expected + n_actual) * ne /
                     CAST(ne + na AS DOUBLE)) *
                  (n_expected - (n_expected + n_actual) * ne /
                     CAST(ne + na AS DOUBLE)) /
                  ((n_expected + n_actual) * ne /
                     CAST(ne + na AS DOUBLE)) +
                  (n_actual - (n_expected + n_actual) * na /
                     CAST(ne + na AS DOUBLE)) *
                  (n_actual - (n_expected + n_actual) * na /
                     CAST(ne + na AS DOUBLE)) /
                  ((n_expected + n_actual) * na /
                     CAST(ne + na AS DOUBLE)), 9) AS chi2_term
         FROM b CROSS JOIN t ORDER BY lang""",
    "a49_kll_quantiles" -> kllOracleSql,
    "a50_heavy_hitters" -> hhOracleSql,
    "a51_ams_f2" -> amsOracleSql,
    "a26_equidepth" ->
      """WITH v AS (SELECT value AS v, COUNT(*) AS cnt FROM events
                    WHERE value IS NOT NULL GROUP BY value),
           c AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum FROM v),
           t AS (SELECT SUM(cnt) AS n_total FROM v),
           b AS (SELECT v, cnt, ((cum - cnt) * 8) // n_total AS bin
                 FROM c CROSS JOIN t)
         SELECT CAST(bin AS BIGINT) AS bin, MIN(v) AS lo, MAX(v) AS hi,
                CAST(SUM(cnt) AS BIGINT) AS n
         FROM b GROUP BY bin ORDER BY bin""",
    "a11_metric_battery" ->
      s"""WITH cm AS (
            SELECT
              CAST(SUM(CASE WHEN label=0 AND pred=0 THEN 1 ELSE 0 END) AS DOUBLE) AS tn,
              CAST(SUM(CASE WHEN label=0 AND pred=1 THEN 1 ELSE 0 END) AS DOUBLE) AS fp,
              CAST(SUM(CASE WHEN label=1 AND pred=0 THEN 1 ELSE 0 END) AS DOUBLE) AS fn,
              CAST(SUM(CASE WHEN label=1 AND pred=1 THEN 1 ELSE 0 END) AS DOUBLE) AS tp
            FROM ($scoredSql)),
          m AS (
            SELECT *,
              tn + fp + fn + tp AS n,
              tn + fp AS sup0, fn + tp AS sup1,
              CASE WHEN tn + fn = 0 THEN 0.0 ELSE tn / (tn + fn) END AS p0,
              CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS p1,
              CASE WHEN tn + fp = 0 THEN 0.0 ELSE tn / (tn + fp) END AS r0,
              CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS r1
            FROM cm),
          f AS (
            SELECT *,
              CASE WHEN p0 + r0 = 0 THEN 0.0 ELSE 2 * p0 * r0 / (p0 + r0) END AS f0,
              CASE WHEN p1 + r1 = 0 THEN 0.0 ELSE 2 * p1 * r1 / (p1 + r1) END AS f1
            FROM m)
          SELECT
            (tp + tn) / n * 100 AS accuracy,
            (p0 * sup0 + p1 * sup1) / n AS precision_weighted,
            (r0 * sup0 + r1 * sup1) / n AS recall_weighted,
            (f0 * sup0 + f1 * sup1) / n AS f1_weighted,
            CASE WHEN tn + fp = 0 THEN 0.0 ELSE tn / (tn + fp) END AS specificity,
            CASE WHEN fp + tn = 0 THEN 0.0 ELSE fp / (fp + tn) END AS false_positive_rate,
            CASE WHEN fn + tp = 0 THEN 0.0 ELSE fn / (fn + tp) END AS false_negative_rate,
            CASE WHEN sqrt((tp+fp)*(tp+fn)*(tn+fp)*(tn+fn)) = 0 THEN 0.0
                 ELSE (tp*tn - fp*fn) / sqrt((tp+fp)*(tp+fn)*(tn+fp)*(tn+fn))
            END AS matthews_corrcoef
          FROM f""",
    "a12_accuracy" ->
      s"""SELECT AVG(CASE WHEN label = pred THEN 1.0 ELSE 0.0 END) * 100 AS accuracy
          FROM ($scoredSql)""",

    // kappa replay: the identical (po - pe)/(1 - pe) double chain
    // over the four BIGINT confusion counts
    "a45_cohens_kappa" ->
      s"""WITH cm AS (
            SELECT
              CAST(SUM(CASE WHEN label=0 AND pred=0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS tn,
              CAST(SUM(CASE WHEN label=0 AND pred=1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS fp,
              CAST(SUM(CASE WHEN label=1 AND pred=0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS fn,
              CAST(SUM(CASE WHEN label=1 AND pred=1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS tp
            FROM ($scoredSql)),
          d AS (SELECT tn, fp, fn, tp,
                  CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE)
                    + CAST(fn AS DOUBLE) + CAST(tp AS DOUBLE) AS n
                FROM cm),
          m AS (SELECT tn + fp + fn + tp AS n_int,
                  (CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE)) / n AS po,
                  ((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
                     * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
                   + (CAST(fn AS DOUBLE) + CAST(tn AS DOUBLE))
                     * (CAST(fp AS DOUBLE) + CAST(tn AS DOUBLE)))
                    / (n * n) AS pe
                FROM d)
          SELECT CAST(n_int AS BIGINT) AS n,
                 round(po, 7) AS po, round(pe, 7) AS pe,
                 CASE WHEN pe < 1.0
                      THEN round((po - pe) / (1.0 - pe), 7) END AS kappa
          FROM m""",
    "a11b_class_report" ->
      s"""WITH cm AS (
            SELECT
              CAST(SUM(CASE WHEN label=0 AND pred=0 THEN 1 ELSE 0 END) AS DOUBLE) AS tn,
              CAST(SUM(CASE WHEN label=0 AND pred=1 THEN 1 ELSE 0 END) AS DOUBLE) AS fp,
              CAST(SUM(CASE WHEN label=1 AND pred=0 THEN 1 ELSE 0 END) AS DOUBLE) AS fn,
              CAST(SUM(CASE WHEN label=1 AND pred=1 THEN 1 ELSE 0 END) AS DOUBLE) AS tp
            FROM ($scoredSql)),
          m AS (
            SELECT *,
              CASE WHEN tn + fn = 0 THEN 0.0 ELSE tn / (tn + fn) END AS p0,
              CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS p1,
              CASE WHEN tn + fp = 0 THEN 0.0 ELSE tn / (tn + fp) END AS r0,
              CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS r1
            FROM cm),
          f AS (
            SELECT *,
              CASE WHEN p0 + r0 = 0 THEN 0.0 ELSE 2 * p0 * r0 / (p0 + r0) END AS f0c,
              CASE WHEN p1 + r1 = 0 THEN 0.0 ELSE 2 * p1 * r1 / (p1 + r1) END AS f1c
            FROM m)
          SELECT 0 AS label_class, p0 AS "precision", r0 AS recall,
                 f0c AS f1, CAST(tn + fp AS BIGINT) AS support FROM f
          UNION ALL
          SELECT 1 AS label_class, p1 AS "precision", r1 AS recall,
                 f1c AS f1, CAST(fn + tp AS BIGINT) AS support FROM f""",
    "a16b_roc_curve" ->
      s"""WITH perth AS (
            SELECT proba AS th,
                   CAST(SUM(CAST(label AS DOUBLE)) AS DOUBLE) AS pos,
                   CAST(SUM(1 - CAST(label AS DOUBLE)) AS DOUBLE) AS neg
            FROM ($scoredSql) GROUP BY proba),
          totals AS (
            SELECT CAST(SUM(CAST(label AS DOUBLE)) AS DOUBLE) AS total_pos,
                   CAST(SUM(1 - CAST(label AS DOUBLE)) AS DOUBLE) AS total_neg
            FROM ($scoredSql)),
          curve AS (
            SELECT th,
              SUM(pos) OVER (ORDER BY th DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
              SUM(neg) OVER (ORDER BY th DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
              total_pos, total_neg
            FROM perth CROSS JOIN totals)
          SELECT th AS threshold, fp / total_neg AS fpr, tp / total_pos AS tpr
          FROM curve""",
    "a17b_pr_curve" ->
      s"""WITH perth AS (
            SELECT proba AS th,
                   CAST(SUM(CAST(label AS DOUBLE)) AS DOUBLE) AS pos,
                   CAST(SUM(1 - CAST(label AS DOUBLE)) AS DOUBLE) AS neg
            FROM ($scoredSql) GROUP BY proba),
          totals AS (
            SELECT CAST(SUM(CAST(label AS DOUBLE)) AS DOUBLE) AS total_pos
            FROM ($scoredSql)),
          curve AS (
            SELECT th,
              SUM(pos) OVER (ORDER BY th DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
              SUM(neg) OVER (ORDER BY th DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
              total_pos
            FROM perth CROSS JOIN totals),
          f AS (
            SELECT th,
              tp / (tp + fp) AS prec, tp / total_pos AS rec
            FROM curve)
          SELECT th AS threshold, prec AS "precision", rec AS recall,
                 CASE WHEN prec + rec = 0 THEN NULL
                      ELSE 2 * prec * rec / (prec + rec) END AS f1
          FROM f""",
    "a23_calibration" ->
      s"""WITH s AS (
            SELECT CAST(proba AS DECIMAL(18,6)) AS p,
                   CAST(label AS DECIMAL(18,6)) AS y,
                   CAST(LEAST(FLOOR(proba * 10), 9) AS INT) AS bin
            FROM ($scoredSql)),
          b AS (
            SELECT bin, COUNT(*) AS n, SUM(p) AS psum, SUM(y) AS ysum,
                   SUM((p - y) * (p - y)) AS sqsum
            FROM s GROUP BY bin)
          SELECT CAST(SUM(sqsum) AS DOUBLE) / SUM(n) AS brier,
                 CAST(SUM(ABS(ysum - psum)) AS DOUBLE) / SUM(n) AS ece,
                 COUNT(*) AS n_bins
          FROM b""",
    "a15_log_loss" ->
      s"""SELECT -AVG(CASE WHEN label = 1 THEN ln(p) ELSE ln(1 - p) END) AS log_loss
          FROM (SELECT label,
                       GREATEST(LEAST(proba, 1 - 1e-15), 1e-15) AS p
                FROM ($scoredSql))""",
    "a16_roc_auc" ->
      s"""WITH ranked AS (
            SELECT CAST(label AS DOUBLE) AS y,
                   RANK() OVER (ORDER BY proba) +
                     (COUNT(*) OVER (PARTITION BY proba) - 1) / 2.0 AS r
            FROM ($scoredSql))
          SELECT CASE WHEN SUM(y) = 0 OR SUM(1 - y) = 0 THEN NULL
                      ELSE (SUM(CASE WHEN y = 1 THEN r ELSE 0.0 END) -
                            SUM(y) * (SUM(y) + 1) / 2.0) /
                           (SUM(y) * SUM(1 - y))
                 END AS roc_auc
          FROM ranked""",
    "a17_optimal_threshold" ->
      s"""WITH perth AS (
            SELECT proba AS th,
                   CAST(SUM(CAST(label AS DOUBLE)) AS DOUBLE) AS pos,
                   CAST(SUM(1 - CAST(label AS DOUBLE)) AS DOUBLE) AS neg
            FROM ($scoredSql) GROUP BY proba),
          totals AS (
            SELECT CAST(SUM(CAST(label AS DOUBLE)) AS DOUBLE) AS total_pos
            FROM ($scoredSql)),
          curve AS (
            SELECT th,
              SUM(pos) OVER (ORDER BY th DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
              SUM(neg) OVER (ORDER BY th DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
              total_pos
            FROM perth CROSS JOIN totals),
          f AS (
            SELECT th,
              tp / (tp + fp) AS prec, tp / total_pos AS rec
            FROM curve),
          g AS (
            SELECT th,
              CASE WHEN prec + rec = 0 THEN NULL
                   ELSE 2 * prec * rec / (prec + rec) END AS f1
            FROM f)
          SELECT th AS optimal_threshold, f1 AS best_f1
          FROM g WHERE f1 IS NOT NULL
          ORDER BY f1 DESC, th ASC LIMIT 1"""
  )
}
