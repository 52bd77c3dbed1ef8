package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing-window velocity features per entity — the classic
  * transaction-stream fraud signal (how many events, how much value,
  * did THIS account generate in the last hour?) that the reference's
  * per-row scorer never sees because it reads one message at a time
  * (`FD/consumer.py` scores each record in isolation). Computed here
  * as a batch feature-engineering pass suitable for training-set
  * construction and backtesting.
  *
  * Scale shape: ONE hash exchange on the entity key, then a per-key
  * local sort feeding a RANGE-frame running window. The frame is
  * time-bounded, so window state per key is bounded by the key's event
  * rate × the window span — no global ordering, no single-reducer
  * funnel, skew bounded by the hottest single entity (an account doing
  * a million events/hour is a data-quality problem before it is a
  * shuffle problem). Value sums are computed in exact DECIMAL(18,2)
  * space (cast BEFORE arithmetic — see `Parity`), so results are
  * bit-reproducible on any engine regardless of intra-frame order.
  */
object Velocity {

  /** Append `<prefix>_n` (trailing event count) and `<prefix>_sum`
    * (trailing exact-decimal value sum, null if every value in the
    * frame is null) to every row: aggregates over the half-open
    * trailing window `(t - windowMicros, t]` within the row's
    * `keyCol` partition. Peer rows (identical timestamp) are all
    * included — RANGE frames close over ties, so two replayed copies
    * of the same event see each other symmetrically.
    *
    * `tsCol` must be epoch-microseconds (LongType) — the testdata's
    * TIMESTAMP(NANOS) longs are `ts div 1000` away; keeping the
    * argument integral sidesteps engine-specific timestamp frame
    * semantics entirely.
    */
  def trailing(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, windowMicros: Long,
               prefix: String = "vel"): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rangeBetween(-(windowMicros - 1), Window.currentRow)
    df.withColumn(s"${prefix}_n", count(lit(1)).over(w))
      .withColumn(s"${prefix}_sum",
        sum(col(valueCol).cast(DecimalType(18, 2))).over(w))
  }

  /** Burst flag: trailing count at-or-above `threshold` — the velocity
    * rule every rules-engine ships before any model does.
    */
  def burst(velNCol: String, threshold: Long): Column =
    col(velNCol) >= threshold

  /** Per-entity EWMA of the value stream — the adaptive spending
    * baseline an anomaly rule compares against (where [[trailing]]
    * counts a hard window, the exponential average never forgets
    * entirely and needs no window bookkeeping: one number per key).
    *
    * EWMA is sequential by nature (the fold is not associative), so
    * it evaluates as ONE per-key fold over the key's time-ordered
    * value array — a doc-bounded collect per entity (bounded by the
    * entity's event count, this module's per-entity contract), never
    * a global sort. The first value seeds the average (matching
    * DuckDB's seedless `list_reduce`), then
    * `ewma' = (1-α)·ewma + α·v` in event-time order, ties broken by
    * the id column so the order is total.
    *
    * α must be the dyadic rational aNum/aDen with aDen a power of
    * two (default 1/8): both α and 1-α are then EXACT doubles, and
    * the fold — same multiplies, same adds, same order — is
    * bit-identical across engines with no rounding step at all (the
    * n10 covariance precedent: engine-exact floats, NO tolerance).
    *
    * Output: (key, n_events, ewma).
    */
  /** Per-entity two-sided CUSUM changepoint detection (Page 1954) —
    * the regime-shift alarm a drift-aware fraud pipeline runs per
    * account: s⁺ accumulates upward drift max(0, s⁺ + (v − target)),
    * s⁻ downward, an alarm fires when either side crosses `h`, and
    * both sides reset (the standard restart). Returns per entity:
    * event count, alarm count, and the final (s⁺, s⁻) state.
    *
    * ALL-INTEGER: values convert to exact cents (`round(v·100)`, the
    * a29 recipe) and target/threshold are cent parameters, so every
    * add/max/compare is exact integer arithmetic with NO float
    * boundary anywhere — w14's oracle replays the fold bit-exactly.
    * (A float CUSUM was tried first: DuckDB 1.0's `list_reduce`
    * evaluated the shared alarm CASE inconsistently ACROSS struct
    * accumulator fields on long lists, so the oracle packs the whole
    * (sp, sn, alarms) state into ONE BIGINT with a SINGLE CASE per
    * step — integers make the packing exact; Spark keeps the readable
    * struct form, equal because integer math has no evaluation-order
    * sensitivity.) Evaluation contract otherwise as [[ewmaFinal]]:
    * one doc-bounded fold per key in (event-time, id) order.
    */
  def cusumFinal(df: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, valueCol: String,
                 targetCents: Long, hCents: Long): DataFrame = {
    require(hCents > 0, s"alarm threshold must be positive: got $hCents")
    def step(acc: Column, v: Column): Column = {
      val sp1 = greatest(lit(0L), acc.getField("sp") + (v - targetCents))
      val sn1 = greatest(lit(0L), acc.getField("sn") - (v - targetCents))
      val alarm = sp1 > hCents || sn1 > hCents
      struct(
        when(alarm, lit(0L)).otherwise(sp1).as("sp"),
        when(alarm, lit(0L)).otherwise(sn1).as("sn"),
        (acc.getField("al") + when(alarm, 1L).otherwise(0L)).as("al"))
    }
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_events"),
        aggregate(
          array_sort(collect_list(struct(col(tsCol).as("t"),
            col(idCol).as("i"),
            round(col(valueCol) * 100).cast("long").as("v")))),
          struct(lit(0L).as("sp"), lit(0L).as("sn"), lit(0L).as("al")),
          (acc, x) => step(acc, x.getField("v"))).as("st"))
      .select(col("key"), col("n_events"), col("st.al").as("alarms"),
        col("st.sp").as("sp_cents"), col("st.sn").as("sn_cents"))
  }

  def ewmaFinal(df: DataFrame, keyCol: String, tsCol: String,
                idCol: String, valueCol: String,
                aNum: Int = 1, aDen: Int = 8): DataFrame = {
    require(aNum > 0 && aDen > 0 && aNum < aDen,
      s"alpha must be a rational in (0,1): got $aNum/$aDen")
    require((aDen & (aDen - 1)) == 0,
      s"aDen must be a power of two so alpha is an exact double: $aDen")
    val alpha = aNum.toDouble / aDen
    val beta = 1.0 - alpha
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_events"),
        aggregate(
          array_sort(collect_list(struct(col(tsCol).as("t"),
            col(idCol).as("i"), col(valueCol).cast("double").as("v")))),
          lit(null).cast("double"),
          (acc, x) => when(acc.isNull, x.getField("v"))
            .otherwise(acc * beta + lit(alpha) * x.getField("v")))
          .as("ewma"))
  }

  /** ROLLING ACTIVE-ENTITY COUNTS — the DAU/WAU/stickiness board
    * metric: for every observed day, how many distinct entities were
    * active that day (`dau`) and in the trailing `windowDays` window
    * (`wau`), plus the stickiness ratio dau/wau.
    *
    * A sliding `countDistinct` window cannot merge partials, so the
    * classic shape is inverted: each (entity, day) ACTIVITY FACT
    * explodes its `windowDays` contribution days, and one grouped
    * `countDistinct` per contribution day does the rest — map-side
    * sets, no window anywhere, cost = facts × windowDays (facts are
    * entity-day pairs, already collapsed from raw events). Days with
    * zero activity of their own are not reported (a trailing window
    * with no anchor day is a chart artifact, not a metric).
    *
    * Output per observed day: `(day, dau, wau, stickiness)` — counts
    * exact, stickiness 7dp-rounded.
    */
  def rollingActives(df: DataFrame, entityCol: String, tsUsCol: String,
                     windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays >= 1")
    val facts = df
      .filter(col(entityCol).isNotNull && col(tsUsCol).isNotNull)
      .select(col(entityCol).as("__e"),
        expr(s"$tsUsCol div 86400000000").as("__day"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contrib = facts
      .withColumn("day",
        explode(sequence(col("__day"), col("__day") + (windowDays - 1))))
      .groupBy(col("day"))
      .agg(countDistinct(col("__e")).as("wau"))
    val daily = facts.groupBy(col("__day").as("day"))
      .agg(count(lit(1)).as("dau"))
    daily.join(contrib, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 7)
          .as("stickiness"))
  }
}
