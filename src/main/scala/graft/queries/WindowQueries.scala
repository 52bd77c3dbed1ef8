package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional and sessionized aggregation coverage (beyond the
  * reference surface): rollup, pivot, and session windows. The session
  * oracle is the classic gaps-and-islands SQL; Spark's `session_window`
  * must agree with it exactly (new session at gap ≥ 30 minutes).
  */
object WindowQueries extends QuerySet {

  /** Shared by batch w21 and streaming st28 (the streaming fold
    * is bit-equal to the batch one by the integer algebra). */
  private[queries] val holtOracleSql: String =
    """WITH daily AS (
           SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS cents
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2),
         ser AS (SELECT event_type, list(cents ORDER BY day) AS ys
                 FROM daily GROUP BY 1),
         st AS (SELECT event_type, ys,
                  list_reduce(
                    list_transform(ys,
                      y -> [y * 1000000, CAST(0 AS BIGINT)]),
                    (acc, x) -> [
                      (3 * x[1] + 7 * (acc[1] + acc[2])) // 10,
                      (3 * (((3 * x[1] + 7 * (acc[1] + acc[2])) // 10)
                            - acc[1]) + 7 * acc[2]) // 10
                    ]) AS s
                FROM ser)
         SELECT event_type, CAST(len(ys) AS BIGINT) AS n_days,
                s[1] AS level_fp, s[2] AS trend_fp,
                s[1] + 7 * s[2] AS forecast7_fp
         FROM st ORDER BY event_type"""

  /** Shared by batch w22 and streaming st29 (the streaming ring fold
    * is bit-equal to the batch one by the integer algebra): replay
    * the Holt–Winters triple fold — list_reduce over the day series
    * lifted to [y·S, 0, 0×7] state lists (the first IS the seed),
    * the level step inlined wherever l_t appears (no lets in SQL
    * lambdas), every step BIGINT with //'s toward-zero truncation.
    * 1-based acc layout: [l, b, s_head .. s_tail].
    */
  private[queries] val holtWintersOracleSql: String = {
    val lp = "((3 * (x[1] - acc[3]) + 7 * (acc[1] + acc[2])) // 10)"
    s"""WITH daily AS (
           SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS cents
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2),
         ser AS (SELECT event_type, list(cents ORDER BY day) AS ys
                 FROM daily GROUP BY 1),
         st AS (SELECT event_type, ys,
                  list_reduce(
                    list_transform(ys, y -> list_concat(
                      [y * 1000000, CAST(0 AS BIGINT)],
                      [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0])),
                    (acc, x) -> list_concat(list_concat(
                      [$lp,
                       (3 * ($lp - acc[1]) + 7 * acc[2]) // 10],
                      acc[4:]),
                      [(3 * (x[1] - $lp) + 7 * acc[3]) // 10])) AS s
                FROM ser)
         SELECT event_type, CAST(len(ys) AS BIGINT) AS n_days,
                s[1] AS level_fp, s[2] AS trend_fp, s[3] AS s_next_fp,
                s[1] + s[2] + s[3] AS forecast1_fp,
                s[1] + 7 * s[2] + s[9] AS forecast7_fp
         FROM st ORDER BY event_type"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ROLLUP over two dims; rolled-up levels surfaced as 'ALL'.
    "w01_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"))
        .orderBy(col("rf"), col("ls"))),

    // Per-group z-score normalization without a window (broadcast
    // moments join); exact decimal sums → engine-identical doubles.
    "w05_group_zscore" -> ((s, d) =>
      graft.ops.Aggregates.zscorePerGroup(
        Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity")),
        "l_returnflag", "l_quantity")
        .groupBy(col("l_returnflag"))
        .agg(count(col("z")).as("n"),
          sum(when(abs(col("z")) > 2, 1L).otherwise(0L)).as("n_outliers"),
          max(col("z")).as("max_z"))
        .orderBy(col("l_returnflag"))),

    // Robust per-group z-score: median/MAD instead of mean/std — the
    // outlier cut a single spam row cannot drag. Lower-median rank
    // rules are integer-exact; every emitted double is engine-identical
    // (no interpolation, no transcendental).
    "w08_robust_zscore" -> ((s, d) =>
      graft.ops.Aggregates.robustZscorePerGroup(
        Tables.events(s, d).filter(col("value").isNotNull)
          .select(col("event_type"), col("value")),
        "event_type", "value", zCol = "z", keepStats = true)
        .groupBy(col("event_type"))
        .agg(min(col("robust_med")).as("med"),
          min(col("robust_mad")).as("mad"),
          count(lit(1)).as("n"),
          sum(when(abs(col("z")) > 3.5, 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))),

    // The bounded-memory twin of w08 (percentile_approx sketches — the
    // path a continuous value column takes at 100 TB, where the exact
    // distinct-value frame would carry the corpus). accuracy=100000
    // exceeds every group's row count at the verify/bench scales, so
    // the sketch's rank bound collapses to exact and the SAME lower-
    // median oracle pins the rank rule; production calls tune accuracy
    // down and accept rank error <= n/accuracy (spec-pinned contract).
    "w08b_robust_zscore_approx" -> ((s, d) =>
      graft.ops.Aggregates.robustZscorePerGroupApprox(
        Tables.events(s, d).filter(col("value").isNotNull)
          .select(col("event_type"), col("value")),
        "event_type", "value", zCol = "z", keepStats = true,
        accuracy = 100000)
        .groupBy(col("event_type"))
        .agg(min(col("robust_med")).as("med"),
          min(col("robust_mad")).as("mad"),
          count(lit(1)).as("n"),
          sum(when(abs(col("z")) > 3.5, 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))),

    // Cross-group quantile normalization: per-returnflag quantity
    // distributions mapped onto the pooled distribution by pure
    // integer rank rules — the distribution-matching ML-prep
    // transform, all engine-exact.
    "w13_quantile_norm" -> ((s, d) =>
      graft.ops.Aggregates.quantileNormalize(
        Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_quantity").cast("long").as("qty")),
        "qty", "l_returnflag")
        .orderBy(col("grp"), col("v"))),

    // Impossible-travel detection (card cloning): consecutive events
    // per user with implied ground speed > 800 km/h, locations derived
    // deterministically from the props.k attribute on a half-degree
    // grid. Haversine spelled identically on both sides; counts are
    // integers, max distance rounds 6dp.
    "w12_impossible_travel" -> ((s, d) => {
      val ev = Tables.eventsMicros(s, d)
        .filter(col("user_id").isNotNull && col("ts_us").isNotNull)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .filter(col("k").isNotNull)
        .withColumn("lat",
          ((col("k") * 37) % 180 - 90).cast("double") + 0.5)
        .withColumn("lon",
          ((col("k") * 53) % 360 - 180).cast("double") + 0.5)
      graft.ops.Journey.impossibleTravel(ev, "user_id", "ts_us",
          "event_id", "lat", "lon", maxKmh = 800.0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hops"),
          sum(when(col("impossible"), 1L).otherwise(0L))
            .as("n_impossible"),
          round(max(col("km")), 6).as("max_km"))
        .orderBy(col("event_type"))
    }),

    // Holt linear-trend smoothing per event type over the daily cent
    // series, in integer fixed-point (ops/Seasonal.holtLinear): the
    // 150-step level/slope recursion is exact integer algebra with
    // toward-zero division in BOTH engines, so the fold — a codegen'd
    // `aggregate` lambda, no UDF, no window — is hash-exact including
    // the 7-step forecast. Completes the forecasting family: w15
    // static profile, w16 backtest, w21 adaptive level+trend.
    "w21_holt" -> ((s, d) =>
      graft.ops.Seasonal.holtLinear(
        Tables.eventsMicros(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("ts_us"),
            round(col("value") * 100).cast("bigint").as("cents")),
        "event_type", "ts_us", "cents")
        .orderBy(col("event_type"))),

    // Holt–Winters additive seasonal smoothing (triple exponential,
    // weekly period) per event type over the daily cent series — the
    // level/trend/seasonal-ring fold entirely in S=1e6 integer
    // fixed-point with toward-zero division, hash-exact against the
    // list_reduce ring oracle including both forecasts. Completes the
    // forecasting family: w15 static profile, w21 adaptive
    // level+trend, w22 adaptive level+trend+season.
    "w22_holt_winters" -> ((s, d) =>
      graft.ops.Seasonal.holtWinters(
        Tables.eventsMicros(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("ts_us"),
            round(col("value") * 100).cast("bigint").as("cents")),
        "event_type", "ts_us", "cents")
        .orderBy(col("event_type"))),

    // Classical trend/seasonal/residual decomposition of spend, all
    // integer (truncated integer means — JVM div ≡ DuckDB //): daily
    // trend per event type, hour-of-day seasonal index of the
    // detrended cents, residual = the anomaly signal. The per-(type,
    // hour) audit pins every component through the oracle.
    "w15_seasonal_decomp" -> ((s, d) =>
      graft.ops.Seasonal.decomposeDayHour(
        Tables.eventsMicros(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("ts_us"),
            round(col("value") * 100).cast("bigint").as("cents")),
        "event_type", "ts_us", "cents")
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"),
          min(col("seasonal")).as("seasonal"),
          sum(abs(col("resid"))).as("sum_abs_resid"),
          max(abs(col("resid"))).as("max_abs_resid"))
        .orderBy(col("event_type"), col("hour"))),

    // Seasonal-naive forecast scored as a true holdout backtest: the
    // last observed day is withheld, trend+seasonal fit on the rest,
    // and every held-out (type, hour) cell gets an integer forecast,
    // a residual-quantile band [p5, p95], the actual, and the
    // coverage flag — all BIGINT, all on the oracle.
    "w16_forecast_backtest" -> ((s, d) =>
      // Cached form: three aggregations re-read the decomposition;
      // Verify/Bench clear the cache after each query
      graft.ops.Seasonal.forecastBacktestCached(
        Tables.eventsMicros(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("ts_us"),
            round(col("value") * 100).cast("bigint").as("cents")),
        "event_type", "ts_us", "cents").df
        .select(col("event_type"), col("hour"), col("n_test"),
          col("forecast"), col("lo"), col("hi"), col("actual"),
          col("abs_err"), col("covered"))
        .orderBy(col("event_type"), col("hour"))),

    // Daily-count autocorrelation per event type at lags 1..3 — the
    // Box–Jenkins seasonality screen over the observed-day series,
    // gap-exact (pairs by calendar distance, not row adjacency),
    // integer sums + one fixed-order double chain.
    "w17_acf" -> ((s, d) =>
      graft.ops.Seasonal.acfDailyCached(
        Tables.eventsMicros(s, d).select(col("event_type"), col("ts_us")),
        "event_type", "ts_us", maxLag = 3)
        .df.orderBy(col("grp"), col("k"))),

    // Length-2 sequential patterns over event types: per ordered pair
    // (a → b), how many users have some a STRICTLY before some b —
    // subsequence semantics (anything may sit in between), not w-family
    // adjacency. Corpus collapses to one (user, type) span aggregation;
    // the pair stage is type-domain² wide, never events² (the a37/a41
    // pair-space discipline).
    "w19_seq_patterns" -> ((s, d) =>
      graft.ops.Journey.sequencePairsCached(
        Tables.eventsMicros(s, d).select(col("user_id"),
          col("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_type", minSupport = 2L).df),

    // Kaplan–Meier time-to-first-purchase: per user, hours from first
    // event to first purchase (event) or to last observation
    // (right-censored) — the survival curve that treats non-converters
    // correctly instead of as failures. Histogram + banded prefix sums
    // for at-risk counts, 7dp ln-sum survival product (the t12
    // transcendental discipline).
    "w20_survival" -> ((s, d) => {
      val ev = Tables.eventsMicros(s, d)
        .filter(col("user_id").isNotNull && col("ts_us").isNotNull)
      val per = ev.groupBy(col("user_id"))
        .agg(min(col("ts_us")).as("t0"),
          min(when(col("event_type") === "purchase", col("ts_us")))
            .as("tp"),
          max(col("ts_us")).as("tmax"))
        .select(
          expr("(coalesce(tp, tmax) - t0) div 3600000000").as("dur_h"),
          col("tp").isNotNull.cast("int").as("ev"))
      graft.ops.Journey.kaplanMeier(per, "dur_h", "ev")
    }),

    // Rolling 7-day active users per observed day (DAU/WAU/stickiness)
    // — contribution-day explode + one grouped countDistinct instead
    // of an unmergeable sliding-distinct window.
    "w18_rolling_actives" -> ((s, d) =>
      graft.ops.Velocity.rollingActives(
        Tables.eventsMicros(s, d).select(col("user_id"), col("ts_us")),
        "user_id", "ts_us", windowDays = 7)
        .orderBy(col("day"))),

    // Per-user two-sided CUSUM changepoint alarms (target 50.00,
    // h 200.00 — as exact integer cents): alarm counts plus the final
    // (s+, s-) state, every add/max/compare exact integer arithmetic,
    // bit-identical to the oracle's packed-state list_reduce.
    "w14_cusum" -> ((s, d) =>
      graft.ops.Velocity.cusumFinal(
        Tables.eventsMicros(s, d).select(col("user_id"),
          col("ts_us"), col("event_id"), col("value")),
        "user_id", "ts_us", "event_id", "value",
        targetCents = 5000L, hCents = 20000L)
        .withColumnRenamed("key", "user_id")
        .orderBy(col("user_id"))),

    // Per-user EWMA spending baseline (α = 1/8 — dyadic, so the fold
    // constants are exact doubles and the sequential fold is
    // bit-identical cross-engine with NO rounding): one doc-bounded
    // per-key fold in event-time order, ties broken by event_id.
    "w11_ewma_baseline" -> ((s, d) =>
      graft.ops.Velocity.ewmaFinal(
        Tables.eventsMicros(s, d).select(col("user_id"),
          col("ts_us"), col("event_id"), col("value")),
        "user_id", "ts_us", "event_id", "value", aNum = 1, aDen = 8)
        .withColumnRenamed("key", "user_id")
        .orderBy(col("user_id"))),

    "w09_velocity" -> ((s, d) => {
      val ev = Tables.eventsMicros(s, d)
        .select(col("event_type"), col("user_id"),
          col("ts_us").as("tus"), col("value"))
      graft.ops.Velocity.trailing(ev, "user_id", "tus", "value",
          windowMicros = 3600L * 1000000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("vel_n")).as("max_vel"),
          sum(when(graft.ops.Velocity.burst("vel_n", 3L), 1L)
            .otherwise(0L)).as("n_burst"),
          max(col("vel_sum")).cast("double").as("max_window_sum"))
        .orderBy(col("event_type"))
    }),

    // CUBE over two dims: all four grouping-set levels in one pass,
    // disambiguated by grouping_id (COALESCE-as-'ALL' would conflate a
    // real 'ALL' value with the rolled-up level; the id cannot).
    "w06_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("gid"), col("rf"), col("ls"))),

    // Per-group winsorization: l_quantity clipped to each returnflag's
    // [p05, p95] band (integer bounds keep the whole pipeline
    // BIGINT-exact); clip counts + clipped-sum per group.
    "w07_winsorize" -> ((s, d) => {
      val qty = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      graft.ops.Aggregates.winsorize(qty, "l_returnflag", "qty",
        pLo = 0.05, pHi = 0.95, outCol = "w", integerBounds = true)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("w") > col("qty"), 1L).otherwise(0L)).as("n_raised"),
          sum(when(col("w") < col("qty"), 1L).otherwise(0L)).as("n_capped"),
          sum(col("w")).as("sum_w"),
          min(col("w")).as("min_w"),
          max(col("w")).as("max_w"))
        .orderBy(col("l_returnflag"))
    }),

    // Pivot on a known domain (conditional-aggregation equivalent).
    "w02_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
        .na.fill(0L, Seq("n_f", "n_o"))
        .orderBy(col("l_returnflag"))),

    // Sliding windows (1h size / 30m slide — every event lands in two
    // windows). Oracle enumerates the candidate window starts per event.
    "w04_sliding" -> ((s, d) =>
      Tables.eventsMicros(s, d)
        .withColumn("t", timestamp_micros(col("ts_us")))
        .groupBy(window(col("t"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("ws"),
          col("event_type"), col("n"))
        .orderBy(col("ws"), col("event_type"))),

    // Session windows: 30-minute inactivity gap per user.
    "w03_session" -> ((s, d) => {
      val ev = Tables.eventsMicros(s, d)
        .withColumn("t", timestamp_micros(col("ts_us")))
      val sessions = ev
        .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      sessions.agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_events"),
        countDistinct(col("user_id")).as("n_users"))
    })
  )

  def oracle: Map[String, String] = Map(
    // replay kaplanMeier: per-user first/first-purchase/last times,
    // hour durations, (t, d, c) histogram, windowed at-risk counts,
    // 7dp ln terms summed as DECIMAL, exp survival, d = n pins 0
    "w20_survival" ->
      """WITH e AS (SELECT user_id AS u, event_type AS ty,
                      epoch_us(ts) AS t
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         per AS (SELECT u, MIN(t) AS t0,
                   MIN(CASE WHEN ty = 'purchase' THEN t END) AS tp,
                   MAX(t) AS tmax
                 FROM e GROUP BY u),
         sub AS (SELECT (COALESCE(tp, tmax) - t0) // 3600000000 AS dur,
                   CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
                 FROM per),
         h AS (SELECT dur AS t, SUM(ev) AS d, SUM(1 - ev) AS c
               FROM sub GROUP BY 1),
         cu AS (SELECT t, d, c, d + c AS lv,
                  SUM(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS cl
                FROM h),
         tt AS (SELECT SUM(lv) AS n FROM cu),
         rk AS (SELECT t, d, c,
                  (SELECT n FROM tt) - (cl - lv) AS risk FROM cu),
         tm AS (SELECT t, d, c, risk,
                  CASE WHEN risk > d THEN
                    CAST(round(ln((CAST(risk AS DOUBLE)
                      - CAST(d AS DOUBLE)) / CAST(risk AS DOUBLE)), 7)
                      AS DECIMAL(18,7))
                  ELSE CAST(0.0 AS DECIMAL(18,7)) END AS lnp
                FROM rk),
         cs AS (SELECT t, d, c, risk,
                  SUM(lnp) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS cl2
                FROM tm)
         SELECT t, CAST(risk AS BIGINT) AS n_risk,
                CAST(d AS BIGINT) AS n_event,
                CAST(c AS BIGINT) AS n_censored,
                CASE WHEN risk > d THEN
                  round(exp(CAST(cl2 AS DOUBLE)), 7)
                ELSE 0.0 END AS survival
         FROM cs ORDER BY t""",

    // replay sequencePairs: (user, type) spans, strict-precedence pair
    // rule on span algebra, entity-count support, antecedent-share
    // confidence. sp is read three times -> MATERIALIZED.
    "w19_seq_patterns" ->
      """WITH e AS (SELECT user_id AS u, event_type AS t,
                      epoch_us(ts) AS ts
                    FROM events
                    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                      AND ts IS NOT NULL),
         sp AS MATERIALIZED (SELECT u, t, MIN(ts) AS mn, MAX(ts) AS mx
               FROM e GROUP BY u, t),
         pr AS (SELECT a.t AS ante, b.t AS cons
                FROM sp a JOIN sp b ON a.u = b.u
                WHERE (a.t <> b.t AND a.mn < b.mx)
                   OR (a.t = b.t AND a.mn < a.mx)),
         sup AS (SELECT ante, cons, COUNT(*) AS support
                 FROM pr GROUP BY 1, 2),
         na AS (SELECT t AS ante, COUNT(*) AS n FROM sp GROUP BY 1)
         SELECT s.ante AS ante, s.cons AS cons,
                CAST(s.support AS BIGINT) AS support,
                round(CAST(s.support AS DOUBLE) / CAST(na.n AS DOUBLE), 7)
                  AS confidence
         FROM sup s JOIN na USING (ante)
         WHERE s.support >= 2
         ORDER BY ante, cons""",
    "w16_forecast_backtest" ->
      """WITH e AS (SELECT event_type AS g, epoch_us(ts) AS t,
                      CAST(round(value * 100) AS BIGINT) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND ts IS NOT NULL
                      AND value IS NOT NULL),
         r AS (SELECT g, t // 86400000000 AS day,
                 (t // 3600000000) % 24 AS hour, v FROM e),
         dm AS (SELECT MAX(day) AS dmax FROM r),
         tnr AS (SELECT r.g, r.day, r.hour, r.v
                 FROM r CROSS JOIN dm WHERE r.day < dm.dmax),
         tst AS (SELECT r.g, r.hour, r.v
                 FROM r CROSS JOIN dm WHERE r.day = dm.dmax),
         tr AS (SELECT g, day,
                  CAST(SUM(v) // COUNT(*) AS BIGINT) AS trend
                FROM tnr GROUP BY g, day),
         dt AS (SELECT tnr.g, tnr.hour, tnr.v, tr.trend,
                  tnr.v - tr.trend AS dev
                FROM tnr JOIN tr ON tnr.g = tr.g AND tnr.day = tr.day),
         tl AS (SELECT tr.g, tr.trend AS t_last
                FROM tr JOIN (SELECT g, MAX(day) AS md FROM tr
                              GROUP BY g) m
                  ON tr.g = m.g AND tr.day = m.md),
         se AS (SELECT g, hour,
                  CAST(SUM(dev) // COUNT(*) AS BIGINT) AS seasonal
                FROM dt GROUP BY g, hour),
         rs AS (SELECT dt.g, dt.v - dt.trend - se.seasonal AS resid
                FROM dt JOIN se ON dt.g = se.g AND dt.hour = se.hour),
         h AS (SELECT g, resid, COUNT(*) AS c FROM rs GROUP BY g, resid),
         nn AS (SELECT g, SUM(c) AS n FROM h GROUP BY g),
         cum AS (SELECT a.g, a.resid, SUM(b.c) AS cum
                 FROM h a JOIN h b ON a.g = b.g AND b.resid <= a.resid
                 GROUP BY a.g, a.resid),
         ql AS (SELECT cum.g, MIN(cum.resid) AS qlo
                FROM cum JOIN nn ON cum.g = nn.g
                WHERE cum.cum * 100 >= nn.n * 5 GROUP BY cum.g),
         qh AS (SELECT cum.g, MIN(cum.resid) AS qhi
                FROM cum JOIN nn ON cum.g = nn.g
                WHERE cum.cum * 100 >= nn.n * 95 GROUP BY cum.g),
         ta AS (SELECT g, hour, COUNT(*) AS n_test,
                  CAST(SUM(v) // COUNT(*) AS BIGINT) AS actual
                FROM tst GROUP BY g, hour)
         SELECT ta.g AS event_type, ta.hour, ta.n_test,
                tl.t_last + se.seasonal AS forecast,
                tl.t_last + se.seasonal + ql.qlo AS lo,
                tl.t_last + se.seasonal + qh.qhi AS hi,
                ta.actual,
                abs(ta.actual - (tl.t_last + se.seasonal)) AS abs_err,
                CASE WHEN ta.actual >= tl.t_last + se.seasonal + ql.qlo
                      AND ta.actual <= tl.t_last + se.seasonal + qh.qhi
                     THEN 1 ELSE 0 END AS covered
         FROM ta JOIN tl ON ta.g = tl.g
              JOIN se ON ta.g = se.g AND ta.hour = se.hour
              JOIN ql ON ta.g = ql.g
              JOIN qh ON ta.g = qh.g
         ORDER BY ta.g, ta.hour""",

    "w18_rolling_actives" ->
      """WITH f AS (SELECT DISTINCT user_id AS e,
                      epoch_us(ts) // 86400000000 AS day
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         c AS (SELECT f.day + o.o AS day, f.e
               FROM f CROSS JOIN (SELECT unnest(range(0, 7)) AS o) o),
         w AS (SELECT day, COUNT(DISTINCT e) AS wau FROM c GROUP BY day),
         dly AS (SELECT day, COUNT(*) AS dau FROM f GROUP BY day)
         SELECT dly.day, dly.dau, w.wau,
                round(CAST(dly.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 7)
                  AS stickiness
         FROM dly JOIN w ON dly.day = w.day
         ORDER BY dly.day""",
    "w17_acf" ->
      """WITH e AS (SELECT event_type AS g,
                      epoch_us(ts) // 86400000000 AS day
                    FROM events
                    WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         s AS (SELECT g, day, COUNT(*) AS x FROM e GROUP BY g, day),
         t AS (SELECT g, COUNT(*) AS nn,
                 SUM(CAST(x AS HUGEINT)) AS ss,
                 SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sss
               FROM s GROUP BY g),
         l AS (SELECT s.g, s.day, s.x, kk.k
               FROM s CROSS JOIN (VALUES (1), (2), (3)) kk(k)),
         p AS (SELECT a.g, a.k, COUNT(*) AS n_pairs,
                 SUM(CAST(a.x AS HUGEINT) * CAST(b.x AS HUGEINT)) AS pp,
                 SUM(CAST(a.x AS HUGEINT)) AS aa,
                 SUM(CAST(b.x AS HUGEINT)) AS bb
               FROM l a JOIN s b ON a.g = b.g AND a.day + a.k = b.day
               GROUP BY a.g, a.k),
         m AS (SELECT p.g, p.k, p.n_pairs, pp, aa, bb, nn, sss,
                 CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) AS mu
               FROM p JOIN t ON p.g = t.g),
         d AS (SELECT g, k, n_pairs, pp, aa, bb, mu,
                 CAST(sss AS DOUBLE)
                   - CAST(nn AS DOUBLE) * mu * mu AS den
               FROM m)
         SELECT g AS grp, k, CAST(n_pairs AS BIGINT) AS n_pairs,
                CASE WHEN den > 0 THEN
                  round((CAST(pp AS DOUBLE) - mu * CAST(aa AS DOUBLE)
                         - mu * CAST(bb AS DOUBLE)
                         + CAST(n_pairs AS DOUBLE) * mu * mu) / den, 7)
                END AS acf
         FROM d ORDER BY grp, k""",

    // replay the integer fixed-point Holt fold: list_reduce over the
    // day series lifted to [y*S, 0] pairs (the first pair IS the
    // seed), every step BIGINT with //'s toward-zero truncation -
    // identical to the engine's div on any sign
    "w21_holt" ->
      holtOracleSql,

    "w22_holt_winters" ->
      holtWintersOracleSql,

    "w15_seasonal_decomp" ->
      """WITH e AS (SELECT event_type AS g, epoch_us(ts) AS t,
                      CAST(round(value * 100) AS BIGINT) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND ts IS NOT NULL
                      AND value IS NOT NULL),
         r AS (SELECT g, t // 86400000000 AS day,
                 (t // 3600000000) % 24 AS hour, v FROM e),
         tr AS (SELECT g, day,
                  CAST(SUM(v) // COUNT(*) AS BIGINT) AS trend
                FROM r GROUP BY g, day),
         dt AS (SELECT r.g, r.hour, r.v, tr.trend,
                  r.v - tr.trend AS dev
                FROM r JOIN tr ON r.g = tr.g AND r.day = tr.day),
         se AS (SELECT g, hour,
                  CAST(SUM(dev) // COUNT(*) AS BIGINT) AS seasonal
                FROM dt GROUP BY g, hour)
         SELECT dt.g AS event_type, dt.hour, COUNT(*) AS n,
                MIN(se.seasonal) AS seasonal,
                CAST(SUM(abs(dt.v - dt.trend - se.seasonal)) AS BIGINT)
                  AS sum_abs_resid,
                MAX(abs(dt.v - dt.trend - se.seasonal)) AS max_abs_resid
         FROM dt JOIN se ON dt.g = se.g AND dt.hour = se.hour
         GROUP BY dt.g, dt.hour ORDER BY dt.g, dt.hour""",

    // the packed-BIGINT fold: (sp, sn, alarms) in one integer with a
    // SINGLE CASE per step — DuckDB 1.0's list_reduce mis-evaluated a
    // shared CASE across struct fields on long lists; integer packing
    // sidesteps it with zero precision loss (cents are exact)
    "w14_cusum" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
                      CAST(round(value * 100) AS BIGINT) AS v
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_id IS NOT NULL AND value IS NOT NULL),
         f AS (SELECT user_id, COUNT(*) AS n_events,
                 list_reduce(
                   list_transform(list(v ORDER BY t, event_id), vv ->
                     vv * 70368744177664 +
                     CASE WHEN greatest(0, vv - 5000) > 20000
                           OR greatest(0, 5000 - vv) > 20000
                          THEN 1
                          ELSE greatest(0, vv - 5000) * 536870912
                               + greatest(0, 5000 - vv) * 4096 END),
                   (acc, x) ->
                     (x // 70368744177664) * 70368744177664 +
                     CASE WHEN greatest(0, (acc // 536870912) % 131072
                                  + (x // 70368744177664) - 5000) > 20000
                           OR greatest(0, (acc // 4096) % 131072
                                  - ((x // 70368744177664) - 5000))
                              > 20000
                          THEN acc % 4096 + 1
                          ELSE greatest(0, (acc // 536870912) % 131072
                                 + (x // 70368744177664) - 5000)
                               * 536870912
                               + greatest(0, (acc // 4096) % 131072
                                 - ((x // 70368744177664) - 5000))
                               * 4096
                               + acc % 4096 END) AS st
               FROM e GROUP BY user_id)
         SELECT user_id, n_events,
                CAST(st % 4096 AS BIGINT) AS alarms,
                CAST((st // 536870912) % 131072 AS BIGINT) AS sp_cents,
                CAST((st // 4096) % 131072 AS BIGINT) AS sn_cents
         FROM f ORDER BY user_id""",
    "w13_quantile_norm" ->
      """WITH r AS (SELECT l_returnflag AS grp,
                      CAST(l_quantity AS BIGINT) AS v FROM lineitem),
         h AS (SELECT grp, v, COUNT(*) AS cnt FROM r GROUP BY 1, 2),
         hc AS (SELECT grp, v, cnt,
                  SUM(cnt) OVER (PARTITION BY grp ORDER BY v) AS cum
                FROM h),
         ng AS (SELECT grp, SUM(cnt) AS n_g FROM h GROUP BY grp),
         gh AS (SELECT v AS gv, COUNT(*) AS gcnt FROM r GROUP BY 1),
         gc AS (SELECT gv, SUM(gcnt) OVER (ORDER BY gv) AS gcum FROM gh),
         tot AS (SELECT COUNT(*) AS n FROM r),
         p AS (SELECT hc.grp, hc.v, hc.cnt,
                 (hc.cum * tot.n + ng.n_g - 1) // ng.n_g AS p
               FROM hc JOIN ng ON hc.grp = ng.grp CROSS JOIN tot)
         SELECT p.grp, p.v, p.cnt AS n, MIN(gc.gv) AS norm
         FROM p JOIN gc ON gc.gcum >= p.p
         GROUP BY 1, 2, 3 ORDER BY grp, v""",
    "w12_impossible_travel" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                      epoch_us(ts) AS t,
                      CAST(json_extract(props, '$.k') AS INT) AS k
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND json_extract(props, '$.k') IS NOT NULL),
         l AS (SELECT *,
                 CAST((k * 37) % 180 - 90 AS DOUBLE) + 0.5 AS lat,
                 CAST((k * 53) % 360 - 180 AS DOUBLE) + 0.5 AS lon
               FROM e),
         h AS (SELECT event_type, t, lat, lon,
                 lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
                 lag(t) OVER w AS pt
               FROM l
               WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         d AS (SELECT event_type, t - pt AS dt,
                 2.0 * 6371.0 * asin(sqrt(
                   sin(((lat - plat) * (pi() / 180.0)) / 2)
                     * sin(((lat - plat) * (pi() / 180.0)) / 2)
                   + cos(plat * (pi() / 180.0))
                     * cos(lat * (pi() / 180.0))
                     * sin(((lon - plon) * (pi() / 180.0)) / 2)
                     * sin(((lon - plon) * (pi() / 180.0)) / 2))) AS km
               FROM h WHERE pt IS NOT NULL)
         SELECT event_type, COUNT(*) AS n_hops,
                CAST(SUM(CASE WHEN km > 1.0 AND (dt = 0
                                OR km / (CAST(dt AS DOUBLE)
                                         / 3600000000.0) > 800.0)
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_impossible,
                round(MAX(km), 6) AS max_km
         FROM d GROUP BY event_type ORDER BY event_type""",
    "w11_ewma_baseline" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_id IS NOT NULL AND value IS NOT NULL)
         SELECT user_id, COUNT(*) AS n_events,
                list_reduce(
                  list(value ORDER BY t, event_id),
                  (acc, x) -> acc * 0.875 + 0.125 * x) AS ewma
         FROM e GROUP BY user_id ORDER BY user_id""",
    "w09_velocity" ->
      """WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS t,
                           CAST(value AS DECIMAL(18,2)) AS v FROM events),
           w AS (SELECT event_type,
                        COUNT(*) OVER win AS vn,
                        SUM(v) OVER win AS vs
                 FROM e
                 WINDOW win AS (PARTITION BY user_id ORDER BY t
                   RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW))
         SELECT event_type, COUNT(*) AS n, MAX(vn) AS max_vel,
                CAST(SUM(CASE WHEN vn >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_burst,
                CAST(MAX(vs) AS DOUBLE) AS max_window_sum
         FROM w GROUP BY event_type ORDER BY event_type""",
    "w08_robust_zscore" ->
      """WITH src AS (SELECT event_type AS g, value AS v FROM events
                      WHERE value IS NOT NULL),
           c AS (SELECT g, v, COUNT(*) AS cnt FROM src GROUP BY 1, 2),
           cum AS (SELECT g, v, cnt,
                     SUM(cnt) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                     SUM(cnt) OVER (PARTITION BY g) AS n FROM c),
           med AS (SELECT g, MIN(v) AS med FROM cum
                   WHERE cum >= (n + 1) // 2 GROUP BY g),
           dev AS (SELECT s.g, ABS(s.v - m.med) AS dv
                   FROM src s JOIN med m ON s.g = m.g),
           dc AS (SELECT g, dv, COUNT(*) AS cnt FROM dev GROUP BY 1, 2),
           dcum AS (SELECT g, dv, cnt,
                      SUM(cnt) OVER (PARTITION BY g ORDER BY dv
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cum,
                      SUM(cnt) OVER (PARTITION BY g) AS n FROM dc),
           mad AS (SELECT g, MIN(dv) AS mad FROM dcum
                   WHERE cum >= (n + 1) // 2 GROUP BY g),
           z AS (SELECT s.g, m.med, d.mad,
                   CASE WHEN d.mad > 0
                     THEN 0.6745 * (s.v - m.med) / d.mad END AS z
                 FROM src s JOIN med m ON s.g = m.g
                            JOIN mad d ON s.g = d.g)
         SELECT g AS event_type, MIN(med) AS med, MIN(mad) AS mad,
                COUNT(*) AS n,
                CAST(SUM(CASE WHEN ABS(z) > 3.5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers
         FROM z GROUP BY g ORDER BY event_type""",
    // identical SQL to w08: at verify scale the sketch is exact (see
    // the query comment), so the approx twin must reproduce the exact
    // lower-median answer bit-for-bit
    "w08b_robust_zscore_approx" ->
      """WITH src AS (SELECT event_type AS g, value AS v FROM events
                      WHERE value IS NOT NULL),
           c AS (SELECT g, v, COUNT(*) AS cnt FROM src GROUP BY 1, 2),
           cum AS (SELECT g, v, cnt,
                     SUM(cnt) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                     SUM(cnt) OVER (PARTITION BY g) AS n FROM c),
           med AS (SELECT g, MIN(v) AS med FROM cum
                   WHERE cum >= (n + 1) // 2 GROUP BY g),
           dev AS (SELECT s.g, ABS(s.v - m.med) AS dv
                   FROM src s JOIN med m ON s.g = m.g),
           dc AS (SELECT g, dv, COUNT(*) AS cnt FROM dev GROUP BY 1, 2),
           dcum AS (SELECT g, dv, cnt,
                      SUM(cnt) OVER (PARTITION BY g ORDER BY dv
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cum,
                      SUM(cnt) OVER (PARTITION BY g) AS n FROM dc),
           mad AS (SELECT g, MIN(dv) AS mad FROM dcum
                   WHERE cum >= (n + 1) // 2 GROUP BY g),
           z AS (SELECT s.g, m.med, d.mad,
                   CASE WHEN d.mad > 0
                     THEN 0.6745 * (s.v - m.med) / d.mad END AS z
                 FROM src s JOIN med m ON s.g = m.g
                            JOIN mad d ON s.g = d.g)
         SELECT g AS event_type, MIN(med) AS med, MIN(mad) AS mad,
                COUNT(*) AS n,
                CAST(SUM(CASE WHEN ABS(z) > 3.5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers
         FROM z GROUP BY g ORDER BY event_type""",
    "w05_group_zscore" ->
      """WITH m AS (
           SELECT l_returnflag AS g, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
                      CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2
           FROM lineitem GROUP BY 1),
          st AS (
           SELECT g, n, s / n AS mean,
                  sqrt((s2 - s * s / n) / (n - 1)) AS std
           FROM m),
          z AS (
           SELECT l.l_returnflag AS g,
                  CASE WHEN st.n >= 2 AND std > 0
                       THEN (l_quantity - mean) / std END AS z
           FROM lineitem l JOIN st ON l.l_returnflag = st.g)
         SELECT g AS l_returnflag, COUNT(z) AS n,
                CAST(SUM(CASE WHEN ABS(z) > 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_outliers,
                MAX(z) AS max_z
         FROM z GROUP BY 1 ORDER BY 1""",
    "w01_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "w06_cube" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
                COALESCE(l_returnflag, 'ALL') AS rf,
                COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY gid, rf, ls""",
    "w07_winsorize" ->
      """WITH q AS (
           SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS qty
           FROM lineitem),
         b AS (
           SELECT g, CAST(ROUND(quantile_cont(qty, 0.05)) AS BIGINT) AS lo,
                  CAST(ROUND(quantile_cont(qty, 0.95)) AS BIGINT) AS hi
           FROM q GROUP BY g),
         w AS (
           SELECT q.g, qty, GREATEST(LEAST(qty, hi), lo) AS w
           FROM q JOIN b ON q.g = b.g)
         SELECT g AS l_returnflag, COUNT(*) AS n,
           CAST(SUM(CASE WHEN w > qty THEN 1 ELSE 0 END) AS BIGINT)
             AS n_raised,
           CAST(SUM(CASE WHEN w < qty THEN 1 ELSE 0 END) AS BIGINT)
             AS n_capped,
           CAST(SUM(w) AS BIGINT) AS sum_w,
           MIN(w) AS min_w, MAX(w) AS max_w
         FROM w GROUP BY g ORDER BY g""",
    "w02_pivot" ->
      """SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "w04_sliding" ->
      """WITH e AS (
           SELECT event_type, epoch_us(ts) // 1000000 AS tsec FROM events),
         cand AS (
           SELECT event_type, tsec,
                  unnest([tsec // 1800 * 1800,
                          tsec // 1800 * 1800 - 1800]) AS ws
           FROM e)
         SELECT ws, event_type, COUNT(*) AS n
         FROM cand
         WHERE tsec >= ws AND tsec < ws + 3600
         GROUP BY ws, event_type ORDER BY ws, event_type""",
    "w03_session" ->
      """WITH d AS (
           SELECT user_id, epoch_us(ts) AS t,
                  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            >= 30 * 60 * 1000000 THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
         s AS (
           SELECT user_id,
                  SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS sid
           FROM d),
         g AS (SELECT user_id, sid, COUNT(*) AS n FROM s GROUP BY user_id, sid)
         SELECT COUNT(*) AS n_sessions,
                CAST(SUM(n) AS BIGINT) AS n_events,
                CAST(MAX(n) AS BIGINT) AS max_events,
                COUNT(DISTINCT user_id) AS n_users
         FROM g"""
  )
}
