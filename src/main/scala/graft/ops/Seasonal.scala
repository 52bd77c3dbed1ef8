package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition, quantized — the
  * time-series screen behind "is this hour's spend spike a fraud burst
  * or just lunchtime?" (the reference eyeballs this on its dashboard's
  * hourly chart, `FD/dashboard.py`; here it is an operator).
  *
  * `value = trend + seasonal + residual` per group:
  *  - trend_{g,day}    — the day's integer-mean cents (low-frequency
  *    level: weekday drift, campaign steps),
  *  - seasonal_{g,hour} — the hour-of-day integer-mean of detrended
  *    values (the daily rhythm),
  *  - residual          — what neither explains; the anomaly signal.
  *
  * All three components are integers: means are exact BIGINT sums
  * divided with the engines' native truncate-toward-zero integer
  * division (JVM `/` ≡ DuckDB `//`), so the decomposition is
  * engine-identical bit for bit — no doubles anywhere. The sub-cent
  * truncation bias is irrelevant for a seasonality profile and is the
  * price of a hash-exact oracle.
  *
  * Scale shape: one grouped agg per component — (group, day) then
  * (group, hour) — each map-side combined; the trend frame joins back
  * on its own grouping key (co-partitioned shuffle, no window, no
  * sort), the hour frame is groups×24 rows and broadcasts. Group and
  * day cardinality are unbounded; nothing touches the driver.
  */
object Seasonal {

  /** Appends `day`, `hour`, `trend`, `seasonal`, `resid` (all BIGINT;
    * cents-scale) to rows with non-null group/timestamp/cents.
    * `tsUsCol` is epoch-microseconds; `centsCol` integer cents.
    */
  def decomposeDayHour(df: DataFrame, groupCol: String, tsUsCol: String,
                       centsCol: String): DataFrame = {
    val rows = df
      .filter(col(groupCol).isNotNull && col(tsUsCol).isNotNull &&
        col(centsCol).isNotNull)
      .withColumn("day", expr(s"$tsUsCol div 86400000000"))
      .withColumn("hour", expr(s"($tsUsCol div 3600000000) % 24"))
    val trend = rows.groupBy(col(groupCol).as("__tg"), col("day").as("__td"))
      .agg(sum(col(centsCol)).as("__s"), count(lit(1)).as("__n"))
      .withColumn("trend", expr("__s div __n")).drop("__s", "__n")
    val detrended = rows
      .join(trend, col(groupCol) === col("__tg") &&
        col("day") === col("__td"))
      .drop("__tg", "__td")
      .withColumn("__dev", col(centsCol) - col("trend"))
    val seasonal = detrended
      .groupBy(col(groupCol).as("__sg"), col("hour").as("__sh"))
      .agg(sum(col("__dev")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("seasonal", expr("__s div __n")).drop("__s", "__n")
    detrended
      .join(broadcast(seasonal), col(groupCol) === col("__sg") &&
        col("hour") === col("__sh"))
      .drop("__sg", "__sh")
      .withColumn("resid",
        col(centsCol) - col("trend") - col("seasonal"))
      .drop("__dev")
  }

  /** Per-group AUTOCORRELATION of a daily count series at lags
    * 1..maxLag — the "does yesterday predict today" diagnostic that
    * decides whether [[forecastBacktest]]'s seasonal-naive model is
    * even applicable, and the standard seasonality screen
    * (Box–Jenkins identification step) over any per-entity series.
    *
    * Gap-exact: the series is the OBSERVED days only, and lag-k pairs
    * are formed by calendar distance (day, day+k both observed), not
    * row adjacency — a window `lag()` would silently pair across gaps.
    * Pairing is one equi-join: the left side explodes k ∈ 1..maxLag
    * and joins on (group, day+k), so no theta join and no per-lag
    * rescan.
    *
    * Engine-exactness: all sums are integer (counts, their products,
    * decimal(38,0) partials); the ACF assembles from them in one
    * fixed-order double chain, 7dp-rounded —
    * `acf_k = (P_k − μ·A_k − μ·B_k + n_k·μ²) / (SS − N·μ²)` with
    * μ = S/N, where P/A/B sum over lag-k pairs and S/SS/N over the
    * whole series. Groups with zero variance (constant series) yield
    * null.
    *
    * Scale shape: the raw table collapses to (group, day) counts in
    * ONE map-side-combinable agg; everything after runs on series
    * rows (groups × days), which is always miniature relative to the
    * input. Output per (group, k): `n_pairs`, `acf`.
    */
  def acfDaily(df: DataFrame, groupCol: String, tsUsCol: String,
               maxLag: Int = 3): DataFrame =
    acfDailyImpl(df, groupCol, tsUsCol, maxLag, persist = false).df

  /** [[acfDaily]] with the collapsed (group, day) series persisted (it
    * feeds the totals, the lag explode, and the pair join's build side)
    * and handed back for release — the form the bench queries run. The
    * plain form is unhinted: leak-free, re-collapsing the raw table up
    * to three times.
    */
  def acfDailyCached(df: DataFrame, groupCol: String, tsUsCol: String,
                     maxLag: Int = 3): Cached =
    acfDailyImpl(df, groupCol, tsUsCol, maxLag, persist = true)

  private def acfDailyImpl(df: DataFrame, groupCol: String,
                           tsUsCol: String, maxLag: Int,
                           persist: Boolean): Cached = {
    require(maxLag >= 1, "maxLag >= 1")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series0 = df
      .filter(col(groupCol).isNotNull && col(tsUsCol).isNotNull)
      .withColumn("__day", expr(s"$tsUsCol div 86400000000"))
      .groupBy(col(groupCol).as("__g"), col("__day"))
      .agg(count(lit(1)).as("__x"))
    val series =
      if (persist) series0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else series0
    val tot = series.groupBy(col("__g"))
      .agg(count(lit(1)).as("__N"),
        sum(col("__x").cast(dec38)).as("__S"),
        sum((col("__x") * col("__x")).cast(dec38)).as("__SS"))
    val lags = series
      .withColumn("__k",
        explode(sequence(lit(1), lit(maxLag))))
      .withColumn("__day2", col("__day") + col("__k"))
    val pairs = lags.as("a")
      .join(series.as("b"),
        col("a.__g") === col("b.__g") && col("a.__day2") === col("b.__day"))
      .groupBy(col("a.__g").as("__g"), col("a.__k").as("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("a.__x") * col("b.__x")).cast(dec38)).as("__P"),
        sum(col("a.__x").cast(dec38)).as("__A"),
        sum(col("b.__x").cast(dec38)).as("__B"))
    val out = pairs.join(tot, Seq("__g"))
      .withColumn("__mu", col("__S").cast("double") / col("__N").cast("double"))
      .withColumn("__den",
        col("__SS").cast("double") -
          col("__N").cast("double") * col("__mu") * col("__mu"))
      .withColumn("acf",
        when(col("__den") > 0.0,
          round((col("__P").cast("double") -
            col("__mu") * col("__A").cast("double") -
            col("__mu") * col("__B").cast("double") +
            col("n_pairs").cast("double") * col("__mu") * col("__mu"))
            / col("__den"), 7)))
      .select(col("__g").as("grp"), col("k"), col("n_pairs"), col("acf"))
    Cached(out, if (persist) Seq(series) else Seq.empty)
  }

  /** Seasonal-naive forecast with a residual-quantile band, scored as
    * a true HOLDOUT BACKTEST: the last observed day is withheld, the
    * decomposition fits on everything before it, and each (group,
    * hour) cell of the held-out day is forecast as
    * `trend(last train day) + seasonal(hour)` with a
    * `[loPct, hiPct]` band from the train residual distribution
    * (the integer first-rank quantile rule of
    * [[Aggregates.histogramQuantiles]], computed as one sorted-
    * histogram fold per group — cents-residuals have data-sized
    * distinct counts, so the triangle-join form is off-limits here).
    *
    * Output per (group, hour) observed in the holdout: `n_test`, the
    * integer `forecast`, `lo`/`hi` band edges, the truncated-mean
    * `actual`, `abs_err`, and the `covered` flag — everything BIGINT,
    * hash-exact. Holdout cells whose hour never occurred in training
    * are dropped (inner join; nothing to forecast from).
    *
    * Scale shape: [[decomposeDayHour]]'s aggs plus a per-group
    * residual histogram (distinct residuals, not rows) and three tiny
    * broadcast joins; the holdout day boundary is a one-row broadcast,
    * never a driver value.
    */
  def forecastBacktest(df: DataFrame, groupCol: String, tsUsCol: String,
                       centsCol: String, loPct: Int = 5,
                       hiPct: Int = 95): DataFrame =
    backtest(df, groupCol, tsUsCol, centsCol, loPct, hiPct,
      persist = false).df

  /** [[forecastBacktest]] with the decomposition frame persisted —
    * lastTrend, seasonal, and the residual histogram all re-read it,
    * so the plain form re-runs the trend join three times (three full
    * scans at 100 TB). Release after the consuming action.
    */
  def forecastBacktestCached(df: DataFrame, groupCol: String,
                             tsUsCol: String, centsCol: String,
                             loPct: Int = 5, hiPct: Int = 95): Cached =
    backtest(df, groupCol, tsUsCol, centsCol, loPct, hiPct,
      persist = true)

  private def backtest(df: DataFrame, groupCol: String, tsUsCol: String,
                       centsCol: String, loPct: Int,
                       hiPct: Int, persist: Boolean): Cached = {
    val rows = df
      .filter(col(groupCol).isNotNull && col(tsUsCol).isNotNull &&
        col(centsCol).isNotNull)
      .withColumn("day", expr(s"$tsUsCol div 86400000000"))
      .withColumn("hour", expr(s"($tsUsCol div 3600000000) % 24"))
    val dmax = rows.agg(max(col("day")).as("__dmax"))
    val split = rows.crossJoin(broadcast(dmax))
    val train = split.filter(col("day") < col("__dmax")).drop("__dmax")
    val test = split.filter(col("day") === col("__dmax")).drop("__dmax")
    val decomp0 = decomposeDayHour(train, groupCol, tsUsCol, centsCol)
    val decomp =
      if (persist) decomp0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else decomp0
    val lastTrend = decomp.groupBy(col(groupCol).as("__tg"))
      .agg(max_by(col("trend"), col("day")).as("__t_last"))
    val seasonal = decomp.groupBy(col(groupCol).as("__sg"),
        col("hour").as("__sh"))
      .agg(min(col("seasonal")).as("__seasonal"))
    // residual quantiles by the same first-rank rule as
    // Aggregates.histogramQuantiles (first bucket with cum·100 ≥ n·q)
    // but via ONE sorted-histogram fold per group instead of its
    // cumulative triangle join — distinct cents-residuals are
    // data-sized, and the O(nb²) triangle was a 40× slowdown at sf0.1
    def rankSelect(arr: org.apache.spark.sql.Column,
                   n: org.apache.spark.sql.Column,
                   q: Int): org.apache.spark.sql.Column =
      aggregate(arr,
        struct(lit(0L).as("c"), lit(null).cast("long").as("m")),
        (acc, x) => struct(
          (acc("c") + x("c")).as("c"),
          coalesce(acc("m"),
            when((acc("c") + x("c")) * 100 >= n * q, x("resid")))
            .as("m")),
        acc => acc("m"))
    val qFrame = decomp
      .groupBy(col(groupCol).as("__qg"), col("resid"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("__qg"))
      .agg(sort_array(collect_list(struct(col("resid"), col("c"))))
        .as("__h"))
      .withColumn("__n",
        aggregate(col("__h"), lit(0L), (a, x) => a + x("c")))
      .withColumn("__qlo", rankSelect(col("__h"), col("__n"), loPct))
      .withColumn("__qhi", rankSelect(col("__h"), col("__n"), hiPct))
      .select(col("__qg"), col("__qlo"), col("__qhi"))
    val out = test.groupBy(col(groupCol), col("hour"))
      .agg(count(lit(1)).as("n_test"), sum(col(centsCol)).as("__s"))
      .withColumn("actual", expr("__s div n_test")).drop("__s")
      // NO broadcast hints: lastTrend/seasonal/qFrame row counts equal
      // group cardinality, which this op does not bound — a forced
      // broadcast would collect an entity-cardinality frame to the
      // driver at 100 TB (the rfmSegments convention). AQE still picks
      // broadcast when the stats frames measure small at runtime.
      .join(lastTrend, col(groupCol) === col("__tg"))
      .join(seasonal, col(groupCol) === col("__sg") &&
        col("hour") === col("__sh"))
      .join(qFrame, col(groupCol) === col("__qg"))
      .withColumn("forecast", col("__t_last") + col("__seasonal"))
      .withColumn("lo", col("forecast") + col("__qlo"))
      .withColumn("hi", col("forecast") + col("__qhi"))
      .withColumn("abs_err", abs(col("actual") - col("forecast")))
      .withColumn("covered",
        (col("actual") >= col("lo") && col("actual") <= col("hi"))
          .cast("int"))
      .drop("__tg", "__t_last", "__sg", "__sh", "__seasonal",
        "__qg", "__qlo", "__qhi")
    Cached(out, if (persist) Seq(decomp) else Seq.empty)
  }

  /** Holt linear-trend (double exponential) smoothing per group, in
    * INTEGER FIXED-POINT — the level-plus-slope forecaster between
    * [[decomposeDayHour]]'s static profile and a full seasonal-Holt:
    * the adaptive baseline a spend-velocity monitor serves when the
    * series drifts (reference capability: the dashboard's daily trend
    * panel, `FD/dashboard.py` hourly/daily charts, as a forecaster
    * instead of an eyeball).
    *
    * The classic recursion (Holt 1957)
    *
    *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * runs at scale S = 10⁶ with α = aNum/aDen, β = bNum/bDen as
    * integer ratios and truncate-toward-zero integer division — the
    * g02-PageRank fixed-point trick applied to a per-key fold, so a
    * 150-step recursion is engine-identical bit for bit (JVM `div` ≡
    * DuckDB `//` on any sign; no float chain to drift). Seeded
    * l₁ = y₁·S, b₁ = 0; h-step forecast = l + h·b.
    *
    * Scale shape: one grouped agg builds the per-group day series
    * (BOUNDED BY THE DAY DOMAIN, never corpus rows — the collect_list
    * caveat doesn't apply to a ≤series-length state), then the fold
    * runs as a codegen'd `aggregate` higher-order function — no UDF,
    * no window, one shuffle on the group key.
    *
    * Overflow contract — CHECKED at runtime (ADVICE r11, the
    * Community/HITS loud-guard pattern): every fold term is bounded
    * by max(aNum, aDen−aNum)·max(|y|·S, |l|+|b|), so the guard
    * requires max|cents| ≤ Int64 / S / max(aNum, aDen−aNum) / 16 —
    * one aggregation on the (persisted) daily frame, which the fold
    * re-reads, so the guard costs no extra corpus scan. The 16×
    * headroom covers the smoothed state's transient drift past the
    * data range (|l| tracks y·S; |b| is an EWMA of level steps —
    * HoltSpec pins |l|+|b| ≤ 8·max|y|·S on a worst-case alternating
    * series at the default ratios). Under the OLD prose-only bound
    * the intermediate 7·(l+b) term sat within 10× of Long.MaxValue
    * and would have wrapped silently; now the fold never builds.
    *
    * Output: group, n_days, level_fp, trend_fp, forecast{h}_fp (all
    * BIGINT, fixed-point at S).
    */
  /** The loud Int64 bound on |daily cents| for the S = 10⁶
    * fixed-point smoothing folds: Int64 / S / maxCoef / 16, where
    * maxCoef is the largest numerator any fold term multiplies by.
    * The 16× headroom absorbs the smoothed state's transient drift
    * past the data range (HoltSpec pins it on a worst-case
    * alternating series).
    */
  private[graft] def fixedPointCentsBound(maxCoef: Int): Long =
    Long.MaxValue / 1000000L / maxCoef / 16L

  /** The loud Int64 input bound for the TRIPLE (Holt–Winters)
    * recursion — derived, not prose (ADVICE r12: the plain-Holt 16×
    * headroom was never pinned for the ring, where the (y − s)
    * feedback couples level and season). The derivation closes
    * because the fold CHECKS the state per step (see
    * [[holtWinters]]): with every carried state cell |l|, |b|, |s_j|
    * ≤ Z = headroom·bound·S and inputs |y·S| ≤ bound·S, each
    * numerator is bounded by
    *
    *   maxCoef·(|y·S − s| + |l| + |b|)  ≤  maxCoef·(bound·S + 3Z)
    *                                    =  maxCoef·bound·S·(3h + 1)
    *
    * so bound = Int64 / S / maxCoef / (3h + 1) makes every fold
    * intermediate provably Int64-safe FOR ALL RATIOS — a trajectory
    * that drifts past the h× envelope (an unstable (α,β,γ) corner)
    * hits the per-step raise_error instead of wrapping. h = 16
    * matches the plain-Holt envelope (HoltSpec pins adversarial
    * triple-recursion drift well inside it at the defaults).
    */
  private[graft] def hwCentsBound(maxCoef: Int, headroom: Long = 16L): Long =
    Long.MaxValue / 1000000L / maxCoef / (3L * headroom + 1L)

  /** [[fixedPointCentsBound]] for the two-parameter Holt fold (doc at
    * [[holtLinear]]). Package-private so the spec pins the arithmetic
    * and the streaming twin
    * ([[graft.streaming.StreamVelocity.holtStates]]) enforces the
    * identical contract per row.
    */
  private[graft] def holtCentsBound(aNum: Int, aDen: Int): Long =
    fixedPointCentsBound(math.max(aNum, aDen - aNum))

  def holtLinear(df: DataFrame, groupCol: String, tsUsCol: String,
                 centsCol: String, aNum: Int = 3, aDen: Int = 10,
                 bNum: Int = 3, bDen: Int = 10, h: Int = 7): DataFrame = {
    require(aNum > 0 && aNum < aDen && bNum > 0 && bNum < bDen,
      s"alpha/beta must be proper positive ratios: $aNum/$aDen, $bNum/$bDen")
    require(h >= 0, s"h must be >= 0, got $h")
    val daily = df
      .filter(col(groupCol).isNotNull && col(tsUsCol).isNotNull &&
        col(centsCol).isNotNull)
      .groupBy(col(groupCol),
        // integer div, not `/` (double division loses exactness)
        expr(s"CAST($tsUsCol AS BIGINT) div 86400000000").as("__day"))
      .agg(sum(col(centsCol).cast("long")).as("__cents"))
      // the guard action materializes this; the fold then re-reads the
      // (group×day)-sized blocks instead of re-scanning the corpus
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // loud overflow guard (doc above): one aggregation on the daily
    // frame, failing before the fold ever builds
    val bound = holtCentsBound(aNum, aDen)
    val maxAbs = daily.agg(max(abs(col("__cents")))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    require(maxAbs <= bound,
      s"holtLinear: max |daily cents| $maxAbs exceeds the Int64 fold " +
        s"bound $bound for alpha=$aNum/$aDen at scale 10^6; rescale " +
        "the value column or aggregate coarser")
    val lExpr = s"($aNum" + "L * y * 1000000L + " +
      s"${aDen - aNum}" + "L * (acc[0] + acc[1])) div " + s"${aDen}L"
    daily.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("__day"), col("__cents"))))
        .as("__series"))
      .withColumn("__ys", expr("transform(__series, p -> p.__cents)"))
      .withColumn("__st", expr(
        "aggregate(slice(__ys, 2, size(__ys) - 1), " +
          "array(element_at(__ys, 1) * 1000000L, 0L), " +
          s"(acc, y) -> array($lExpr, " +
          s"(${bNum}L * (($lExpr) - acc[0]) + ${bDen - bNum}L * acc[1]) " +
          s"div ${bDen}L))"))
      .select(col(groupCol),
        size(col("__ys")).cast("long").as("n_days"),
        col("__st")(0).as("level_fp"),
        col("__st")(1).as("trend_fp"),
        (col("__st")(0) + lit(h.toLong) * col("__st")(1))
          .as(s"forecast${h}_fp"))
  }

  /** Holt–Winters ADDITIVE seasonal smoothing per group, in the same
    * S = 10⁶ integer fixed-point as [[holtLinear]] — triple
    * exponential smoothing (Winters 1960), the composition the
    * forecasting family was missing: w15's seasonal profile is
    * STATIC, w21's Holt adapts level+trend but is season-blind; this
    * adapts all three. The classic recursion with period p and
    * γ = gNum/gDen:
    *
    *   l_t = α·(y_t − s_{t−p}) + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_t = γ·(y_t − l_t)    + (1−γ)·s_{t−p}
    *
    * runs on y·S with integer ratios and truncate-toward-zero
    * division (JVM `div` ≡ DuckDB `//` on any sign), so the whole
    * fold — level, trend, AND the p-slot seasonal ring — is
    * engine-identical bit for bit. Seed: l₁ = y₁·S, b₁ = 0, ring all
    * zeros (s_j = 0 for j ≤ 1; the first p steps smooth against a
    * zero season, the standard cold-start).
    *
    * State per group is an array of p + 2 BIGINTs `[l, b, s₁..s_p]`
    * with the head of the ring the seasonal due NEXT; each step
    * consumes the head and appends the fresh s_t — a slice + concat
    * in the codegen'd `aggregate` lambda, no UDF, no window, one
    * shuffle on the group key (the [[holtLinear]] scale shape; the
    * day series stays bounded by the day domain).
    *
    * Output (all BIGINT fixed-point at S): `n_days`, `level_fp`,
    * `trend_fp`, `s_next_fp` (seasonal due at t+1), `forecast1_fp` =
    * l + b + s_next, and `forecast<p>_fp` = l + p·b + s_last (at
    * h = p the seasonal due is the freshest s_t).
    *
    * Overflow: TWO loud guards, together sound for all ratios
    * ([[hwCentsBound]] has the derivation). The input guard bounds
    * max|daily cents| at Int64/S/maxCoef/(3h+1); the fold then checks
    * every carried state cell against Z = h·bound·S PER STEP (the
    * level inline — it feeds the same step's trend and season
    * numerators — and the post-step array), so no numerator can ever
    * build past Int64: drift beyond the h× envelope fails loudly on
    * the Spark side exactly where DuckDB would error natively.
    * `driftHeadroom` IS h — spec-visible so HoltSpec can force the
    * guard to fire on an ordinary series.
    */
  def holtWinters(df: DataFrame, groupCol: String, tsUsCol: String,
                  centsCol: String, period: Int = 7,
                  aNum: Int = 3, aDen: Int = 10,
                  bNum: Int = 3, bDen: Int = 10,
                  gNum: Int = 3, gDen: Int = 10,
                  driftHeadroom: Long = 16L): DataFrame = {
    require(aNum > 0 && aNum < aDen && bNum > 0 && bNum < bDen &&
      gNum > 0 && gNum < gDen,
      s"alpha/beta/gamma must be proper positive ratios: " +
        s"$aNum/$aDen, $bNum/$bDen, $gNum/$gDen")
    require(period >= 2 && period <= 24,
      s"period must be in [2,24], got $period")
    val daily = df
      .filter(col(groupCol).isNotNull && col(tsUsCol).isNotNull &&
        col(centsCol).isNotNull)
      .groupBy(col(groupCol),
        expr(s"CAST($tsUsCol AS BIGINT) div 86400000000").as("__day"))
      .agg(sum(col(centsCol).cast("long")).as("__cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    require(driftHeadroom >= 1L && driftHeadroom <= 1024L,
      s"driftHeadroom in [1, 1024], got $driftHeadroom")
    val maxCoef = Seq(aNum, aDen - aNum, bNum, bDen - bNum,
      gNum, gDen - gNum).max
    val bound = hwCentsBound(maxCoef, driftHeadroom)
    val maxAbs = daily.agg(max(abs(col("__cents")))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    require(maxAbs <= bound,
      s"holtWinters: max |daily cents| $maxAbs exceeds the Int64 fold " +
        s"bound $bound for ratios $aNum/$aDen, $bNum/$bDen, $gNum/$gDen " +
        "at scale 10^6; rescale the value column or aggregate coarser")
    // the per-step state envelope Z = h·bound·S (object doc at
    // hwCentsBound: with all cells <= Z and inputs <= bound·S, every
    // numerator below fits Int64 by construction)
    val z = driftHeadroom * bound * 1000000L
    val zErr = "cast(raise_error('holtWinters: smoothed state " +
      s"drifted past ${driftHeadroom}x the Int64 input bound — " +
      "unstable alpha/beta/gamma for this series') as bigint)"
    // the level step, inlined wherever l_t appears (no lets in SQL
    // lambdas — the w21 oracle's proven pattern): acc layout is
    // 0-based [l, b, s_head, ..., s_tail]. The raw lp feeds the
    // step's OWN trend/season numerators, so it is guarded inline
    // (lpG), not just in the post-step array check.
    val lp = s"((${aNum}L * (y * 1000000L - acc[2]) + " +
      s"${aDen - aNum}L * (acc[0] + acc[1])) div ${aDen}L)"
    val lpG = s"(if(abs($lp) <= ${z}L, $lp, $zErr))"
    val step = s"(acc, y) -> transform(concat(" +
      s"array($lpG, " +
      s"(${bNum}L * ($lpG - acc[0]) + ${bDen - bNum}L * acc[1]) " +
      s"div ${bDen}L), " +
      s"slice(acc, 4, ${period - 1}), " +
      s"array((${gNum}L * (y * 1000000L - $lpG) + " +
      s"${gDen - gNum}L * acc[2]) div ${gDen}L)), " +
      s"v -> if(abs(v) <= ${z}L, v, $zErr))"
    daily.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("__day"), col("__cents"))))
        .as("__series"))
      .withColumn("__ys", expr("transform(__series, p -> p.__cents)"))
      .withColumn("__st", expr(
        "aggregate(slice(__ys, 2, size(__ys) - 1), " +
          "concat(array(element_at(__ys, 1) * 1000000L, 0L), " +
          s"array_repeat(0L, $period)), $step)"))
      .select(col(groupCol),
        size(col("__ys")).cast("long").as("n_days"),
        col("__st")(0).as("level_fp"),
        col("__st")(1).as("trend_fp"),
        col("__st")(2).as("s_next_fp"),
        (col("__st")(0) + col("__st")(1) + col("__st")(2))
          .as("forecast1_fp"),
        (col("__st")(0) + lit(period.toLong) * col("__st")(1) +
          col("__st")(period + 1)).as(s"forecast${period}_fp"))
  }
}
