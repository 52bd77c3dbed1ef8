package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-journey analytics over an event stream — cohort retention and
  * ordered conversion funnels, the two read-side questions every
  * event-producing product asks of exactly the table the reference's
  * pipeline emits (`FD/consumer.py` logs one row per scored
  * transaction; these aggregate the journey ACROSS rows per account).
  *
  * Scale shape: every stage keys on the entity column — the first-touch
  * aggregate, the stage joins, and the stage minima are all
  * co-partitioned on one hash key, so N funnel stages cost N passes
  * over an already-partitioned frame, never N re-shuffles of the
  * corpus. Timestamps stay integral epoch-micros throughout: stage
  * ordering, offsets, and lags are exact integer arithmetic,
  * bit-reproducible on any engine.
  */
object Journey {

  /** Retention matrix: bucket each entity by its FIRST event time
    * (cohort), then count distinct entities active per (cohort,
    * offset) bucket pair. `bucketMicros` is the grid (a day, a week).
    * Integer floor-division buckets — no timezone, no calendar.
    *
    * Two key exchanges: entity → first-touch, then (cohort, offset) →
    * distinct count (partial-deduped map-side by the expand).
    */
  def cohortRetention(df: DataFrame, entityCol: String, tsCol: String,
                      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    // exact floor division: subtract the (always non-negative) pmod so
    // the quotient is an integral multiple — no double rounding at
    // bucket boundaries, and true floor (not truncate-toward-zero)
    // for pre-epoch timestamps
    val bucket = (c: Column) =>
      ((c - pmod(c, lit(bucketMicros))) / lit(bucketMicros)).cast("long")
    val firsts = df.groupBy(col(entityCol).as("__e"))
      .agg(min(bucket(col(tsCol))).as("cohort"))
    df.select(col(entityCol), bucket(col(tsCol)).as("__b"))
      .join(firsts, col(entityCol) <=> col("__e"))
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("offset"))
      .agg(countDistinct(col(entityCol)).as("n_active"))
  }

  /** Event-level sessionization: assign every event its entity's
    * 0-based session index (new session when the gap since the
    * previous event is >= `gapMicros` — the same inclusive rule as
    * `session_window`'s close) plus `gap_us`, the exact integer gap to
    * the previous event (null on each entity's first). This is the
    * ASSIGNMENT form of w03's aggregate: the session-example builder a
    * training pipeline needs (session features, within-session
    * ordering, session-level labels), where `session_window` only
    * yields per-session aggregates.
    *
    * ONE key exchange + per-key local sort (lag + running sum over the
    * entity partition); per-key window state is one row. Entity skew
    * bounds the reducer: a hot entity's events sort on one task — the
    * same bound as any per-entity sequence model's input builder, and
    * orders of magnitude below corpus scale.
    */
  def sessionize(df: DataFrame, entityCol: String, tsCol: String,
                 gapMicros: Long,
                 sessionCol: String = "session_idx",
                 gapCol: String = "gap_us"): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(gapCol, col(tsCol) - lag(col(tsCol), 1).over(w))
      .withColumn(sessionCol,
        (sum(when(col(gapCol).isNull || col(gapCol) >= gapMicros, 1L)
          .otherwise(0L)).over(run) - 1L).as(sessionCol))
  }

  /** Ordered conversion funnel: `stages` are (name, predicate) pairs;
    * an entity reaches stage i at the EARLIEST event satisfying
    * predicate i at-or-after its stage i−1 time (`>=`, so a
    * same-microsecond chain converts). Returns one row per stage:
    * `(stage_idx, stage, n_entities, sum_lag_us)` where `sum_lag_us`
    * is the exact integer sum of per-entity lags from the previous
    * stage (null for stage 0) — divide by `n_entities` for the mean
    * conversion lag without losing cross-engine exactness inside the
    * aggregate.
    */
  def funnel(df: DataFrame, entityCol: String, tsCol: String,
             stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val ev = df.select(col(entityCol).as("__e"), col(tsCol).as("__t"),
      struct(stages.zipWithIndex.map { case ((_, p), i) =>
        p.as(s"col$i") }: _*).as("__p"))
    // fold: frame of (entity, stage-i time, lag from stage i-1)
    val reached = stages.zipWithIndex.scanLeft(
      Option.empty[DataFrame]) { case (prevOpt, ((_, _), i)) =>
      val hit = ev.filter(col("__p")(s"col$i"))
      Some(prevOpt match {
        case None =>
          hit.groupBy(col("__e")).agg(min(col("__t")).as("__st"))
            .withColumn("__lag", lit(null).cast("long"))
        case Some(prev) =>
          hit.join(prev.select(col("__e").as("__pe"),
              col("__st").as("__pt")), col("__e") <=> col("__pe"))
            .filter(col("__t") >= col("__pt"))
            .groupBy(col("__e"))
            .agg(min(col("__t")).as("__st"), min(col("__pt")).as("__pt"))
            .withColumn("__lag", col("__st") - col("__pt"))
      })
    }.flatten
    reached.zip(stages).zipWithIndex.map { case ((r, (name, _)), i) =>
      r.agg(count(lit(1)).as("n_entities"),
        sum(col("__lag")).as("sum_lag_us"))
        .select(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
          col("n_entities"), col("sum_lag_us"))
    }.reduce(_ unionByName _)
  }

  /** First-order Markov transition matrix over an event-state column —
    * the journey summary (what follows what) behind next-action
    * prediction and anomalous-sequence scoring: per (prev_state,
    * state) pair, the transition count and the row-normalized
    * probability count/Σ_row. Consecutive = (event-time, id) order per
    * entity (the [[sessionize]]/[[impossibleTravel]] lag shape — one
    * key exchange, one-row window state); each entity's first event
    * has no predecessor and drops. Counts are integers and the
    * probability is one exact-integer division — engine-identical.
    */
  def transitionMatrix(df: DataFrame, entityCol: String, tsCol: String,
                       idCol: String, stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_state"),
        col(stateCol).as("state"))
      .agg(count(lit(1)).as("n"))
    val rowTot = pairs.groupBy(col("prev_state").as("__ps"))
      .agg(sum(col("n")).as("__row_n"))
    pairs.join(broadcast(rowTot), col("prev_state") === col("__ps"))
      .select(col("prev_state"), col("state"), col("n"),
        (col("n").cast("double") / col("__row_n").cast("double"))
          .as("p"))
  }

  /** SEQUENTIAL-PATTERN support (depth 2): for every ordered pair of
    * event types (a → b), how many entities have SOME a-event strictly
    * before SOME b-event — the subsequence ("followed by, eventually")
    * semantics of PrefixSpan/SPAM length-2 patterns, which
    * [[transitionMatrix]]'s ADJACENT bigrams cannot express (a → b
    * with anything in between still counts here).
    *
    * The scale trick: "∃ i<j with type_i = a, type_j = b" collapses to
    * span algebra — a ≠ b: min_ts(a) < max_ts(b); a = b: two events at
    * distinct timestamps. So the corpus reduces to ONE (entity, type)
    * aggregation of (min, max, cnt) spans, and the pair stage is a
    * self-join on entity whose per-entity width is the TYPE DOMAIN,
    * never the entity's event count — type-domain² output bound, the
    * a37/a41 pair-space discipline. Support counts entities (spans are
    * unique per (entity, type), so COUNT(*) is the entity count);
    * confidence divides by the antecedent's entity count.
    *
    * Equal-timestamp co-occurrence is NOT counted ("strictly
    * precedes") — ties carry no order evidence.
    *
    * Output: `(ante, cons, support, confidence)` for pairs with
    * support ≥ `minSupport`, ordered by (ante, cons).
    */
  def sequencePairs(df: DataFrame, entityCol: String, tsCol: String,
                    typeCol: String, minSupport: Long = 2L): DataFrame = {
    val c = sequencePairsCached(df, entityCol, tsCol, typeCol, minSupport)
    c.df
  }

  def sequencePairsCached(df: DataFrame, entityCol: String, tsCol: String,
                          typeCol: String,
                          minSupport: Long = 2L): Cached = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val spans = df
      .filter(col(entityCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .groupBy(col(entityCol).as("__e"), col(typeCol).as("__t"))
      .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = spans.as("a").join(spans.as("b"),
      col("a.__e") === col("b.__e") &&
        ((col("a.__t") =!= col("b.__t") && col("a.__mn") < col("b.__mx"))
          || (col("a.__t") === col("b.__t") &&
            col("a.__mn") < col("a.__mx"))))
    val sup = pairs
      .groupBy(col("a.__t").as("ante"), col("b.__t").as("cons"))
      .agg(count(lit(1)).as("support"))
    val nA = spans.groupBy(col("__t").as("ante"))
      .agg(count(lit(1)).as("__na"))
    val out = sup.join(broadcast(nA), Seq("ante"))
      .filter(col("support") >= minSupport)
      .select(col("ante"), col("cons"), col("support"),
        round(col("support").cast("double") /
          col("__na").cast("double"), 7).as("confidence"))
      .orderBy(col("ante"), col("cons"))
    Cached(out, Seq(spans))
  }

  /** KAPLAN–MEIER survival over right-censored durations — the
    * time-to-event pillar (time-to-first-purchase here; time-to-
    * chargeback, time-to-churn, document retention elsewhere): at each
    * distinct duration t, S(t) = Π_{t' ≤ t} (1 − d_{t'}/n_{t'}) with
    * d = events at t' and n = subjects still at risk. Censored
    * subjects (never converted) leave the risk set at their last
    * observation without counting as events — the estimator's whole
    * point; naive conversion curves silently treat them as failures.
    *
    * Input: one row per subject `(durCol integer, eventCol 0/1)` —
    * duration in whatever integer unit the caller bucketed (hours
    * here), event = 1 observed, 0 right-censored.
    *
    * Exactness: the duration table collapses to the (t, d, c)
    * histogram; at-risk counts come from [[graft.ops.Aggregates
    * .bucketedPrefixSums]] (no global window); the survival product is
    * the 7dp-rounded ln-sum — ln((n−d)/n) on engine-identical doubles,
    * DECIMAL(18,7) cumulative sums, one exp per row, 7dp output (the
    * t12 transcendental discipline). A level where d = n (everyone
    * remaining fails) pins S = 0 exactly, no ln(0).
    *
    * Output per distinct duration: `(t, n_risk, n_event, n_censored,
    * survival)`, ascending t.
    *
    * Scale shape: one subject-keyed aggregation upstream (the caller),
    * one histogram groupBy, the banded prefix-sum join twice (counts
    * and ln terms) — cost bounded by distinct durations, never
    * subjects.
    */
  def kaplanMeier(df: DataFrame, durCol: String,
                  eventCol: String): DataFrame = {
    val hist = df
      .filter(col(durCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durCol).cast("long").as("__t"))
      .agg(sum(col(eventCol).cast("long")).as("__d"),
        sum(lit(1L) - col(eventCol).cast("long")).as("__c"))
      .withColumn("__leave", col("__d") + col("__c"))
    val cum = graft.ops.Aggregates.bucketedPrefixSums(hist, "__t",
      ascending = true, sumCols = Seq("__leave"))
    val tot = cum.agg(sum(col("__leave")).as("__n")).select(col("__n"))
    val withRisk = cum.crossJoin(broadcast(tot))
      .withColumn("__risk",
        col("__n") - (col("cum___leave") - col("__leave")))
    val nD = col("__risk").cast("double")
    val dD = col("__d").cast("double")
    val term = when(col("__risk") > col("__d"),
      round(log((nD - dD) / nD), 7)).otherwise(lit(0.0))
    // decimal(11,7), NOT wider: the prefix-sum machinery widens by +10
    // per aggregation layer (local window, bucket totals, offsets), and
    // the final local+offset ADD on anything wider than (28,7)+(38,7)
    // overflows precision 38 — Spark then silently REDUCES THE SCALE
    // to 6 and the survival product loses its 7th decimal (measured:
    // cum −0.2231436 → −0.223144). |ln| ≤ ln(n) ≈ 18 fits (11,7).
    val termed = withRisk.withColumn("__ln",
      term.cast("decimal(11,7)"))
    val cum2 = graft.ops.Aggregates.bucketedPrefixSums(
      termed.select(col("__t"), col("__risk"), col("__d"), col("__c"),
        col("__ln")),
      "__t", ascending = true, sumCols = Seq("__ln"))
    cum2.select(col("__t").as("t"),
        col("__risk").cast("long").as("n_risk"),
        col("__d").cast("long").as("n_event"),
        col("__c").cast("long").as("n_censored"),
        when(col("__risk") > col("__d"),
          round(exp(col("cum___ln").cast("double")), 7))
          .otherwise(lit(0.0)).as("survival"))
      .orderBy(col("t"))
  }

  /** Great-circle distance (km) between two (lat, lon) degree pairs —
    * the haversine formula, mean Earth radius 6371 km. Plain column
    * trig spelled identically in the w12 oracle; transcendental, so
    * consumers round before comparing output (flags compare raw —
    * the thresholds sit far from any data point's value).
    */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val toRad = math.Pi / 180.0
    val dLat = (lat2 - lat1) * toRad
    val dLon = (lon2 - lon1) * toRad
    val a = sin(dLat / 2) * sin(dLat / 2) +
      cos(lat1 * toRad) * cos(lat2 * toRad) *
        sin(dLon / 2) * sin(dLon / 2)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** Impossible-travel detection — the classic card-cloning rule: two
    * consecutive events for one entity whose implied ground speed
    * exceeds `maxKmh` (or that teleport: distinct locations at the
    * same instant). Consecutive = (event-time, id) order within the
    * entity, one key exchange + per-key lag window (the [[sessionize]]
    * shape — window state is one row, partitioned by entity, never
    * global).
    *
    * Input needs (entityCol, tsCol µs, idCol, latCol, lonCol).
    * Output: one row per HOP (2nd..nth event of each entity) with
    * `km` (haversine), `dt_us`, and `impossible` — flagged when
    * km > 1 and (dt_us == 0 or speed > maxKmh). The km > 1 floor
    * keeps same-location replays (km = 0) and sub-kilometer GPS
    * jitter out of the alert set.
    */
  def impossibleTravel(df: DataFrame, entityCol: String, tsCol: String,
                       idCol: String, latCol: String, lonCol: String,
                       maxKmh: Double = 800.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(idCol))
    val hops = df
      .withColumn("__plat", lag(col(latCol), 1).over(w))
      .withColumn("__plon", lag(col(lonCol), 1).over(w))
      .withColumn("__pts", lag(col(tsCol), 1).over(w))
      .filter(col("__pts").isNotNull)
    val km = haversineKm(col("__plat"), col("__plon"),
      col(latCol), col(lonCol))
    hops
      .withColumn("km", km)
      .withColumn("dt_us", col(tsCol) - col("__pts"))
      .withColumn("impossible",
        col("km") > 1.0 && (col("dt_us") === 0L ||
          col("km") / (col("dt_us").cast("double") / 3.6e9) > maxKmh))
      .drop("__plat", "__plon", "__pts")
  }

  /** RFM SEGMENTATION — the classic recency/frequency/monetary
    * customer scoring (direct-marketing practice since Hughes 1994):
    * per entity, days since last activity, activity count, and total
    * integer spend, each mapped to a 1–5 score by the EQUIDEPTH
    * value-level rank rule (all rows sharing a metric value share a
    * score — `1 + (first_rank − 1)·5 div N`, pure integer arithmetic,
    * no percentile interpolation), recency reversed so 5 = most
    * recent. The rule is the [[Aggregates.equidepthBins]] stance, so
    * scores are engine-exact and a heavy value making its band
    * oversized is reported, not hidden.
    *
    * Scale shape: one per-entity agg over the activity table, a
    * broadcast 1-row anchor (global max day) and N, then per metric a
    * DISTINCT-value rank frame ([[Aggregates.bucketedPrefixSums]] —
    * no global window) joined back by value. Cost after the first agg
    * is bounded by metric cardinality, not entities.
    *
    * Output per (r_score, f_score, m_score) cell: `n_entities`,
    * `sum_cents` — the segment matrix a campaign targets from.
    */
  def rfmSegments(df: DataFrame, entityCol: String, tsUsCol: String,
                  centsCol: String): DataFrame =
    rfmSegmentsImpl(df, entityCol, tsUsCol, centsCol, persist = false).df

  /** [[rfmSegments]] with the per-entity aggregate and scored frame
    * persisted (read by all three metric rank frames AND the final
    * join chain) and handed back for release — the form the bench
    * queries run. The plain form is unhinted and leak-free.
    */
  def rfmSegmentsCached(df: DataFrame, entityCol: String, tsUsCol: String,
                        centsCol: String): Cached =
    rfmSegmentsImpl(df, entityCol, tsUsCol, centsCol, persist = true)

  private def rfmSegmentsImpl(df: DataFrame, entityCol: String,
                              tsUsCol: String, centsCol: String,
                              persist: Boolean): Cached = {
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def pin(d: DataFrame): DataFrame =
      if (persist) {
        val p = d.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pinned += p; p
      } else d
    val perEnt = pin(df
      .filter(col(entityCol).isNotNull && col(tsUsCol).isNotNull &&
        col(centsCol).isNotNull)
      .select(col(entityCol).as("__e"),
        expr(s"$tsUsCol div 86400000000").as("__day"),
        col(centsCol).cast("long").as("__cents"))
      .groupBy(col("__e"))
      .agg(max(col("__day")).as("__last"), count(lit(1)).as("__f"),
        sum(col("__cents")).as("__m")))
    val anchor = perEnt.agg(max(col("__last")).as("__gmax"),
      count(lit(1)).as("__N"))
    // read by all three metric rank frames AND the final join chain
    val scored = pin(perEnt.crossJoin(broadcast(anchor))
      .withColumn("__r", col("__gmax") - col("__last")))
    // integer `div` on the rank product — never true-division + cast,
    // which would round instead of truncate and break oracle parity
    def scoreExpr(metric: String): DataFrame = {
      val vals = scored.groupBy(col(metric)).agg(count(lit(1)).as("__cnt"))
      Aggregates.bucketedPrefixSums(vals, metric, ascending = true,
          sumCols = Seq("__cnt"))
        .crossJoin(broadcast(anchor.select(col("__N"))))
        .withColumn("__fr", col("cum___cnt") - col("__cnt"))
        .withColumn(s"__s$metric",
          lit(1) + expr("(__fr * 5) div __N"))
        .select(col(metric), col(s"__s$metric"))
    }
    // NO broadcast hints: recency (days) and frequency (counts) rank
    // frames are domain-bounded, but MONETARY totals are near-unique
    // per entity — a forced broadcast would collect an
    // entity-cardinality frame to the driver at scale. AQE broadcasts
    // the small ones on its own.
    val out = scored
      .join(scoreExpr("__r"), Seq("__r"))
      .join(scoreExpr("__f"), Seq("__f"))
      .join(scoreExpr("__m"), Seq("__m"))
      .select((lit(6) - col("__s__r")).as("r_score"),
        col("__s__f").as("f_score"), col("__s__m").as("m_score"),
        col("__m"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_entities"),
        sum(col("__m")).as("sum_cents"))
    Cached(out, pinned.toSeq)
  }

  /** GEO RADIUS SELF-JOIN: all point pairs within `radiusKm`
    * great-circle km — the proximity pairing behind merchant-cluster
    * fraud rings, "same physical location, different accounts", and
    * POI conflation. Blocking is a 3-D CHORD GRID, not lat/lon tiles:
    * each point embeds on the R=6371 km sphere
    * (x,y,z) = R·(cosφcosλ, cosφsinλ, sinφ), and two points within
    * haversine distance r have chord length ≤ c = 2R·sin(r/2R), so
    * cubic cells of side c guarantee any qualifying pair sits within
    * one cell step per axis. That single theorem replaces every
    * lat/lon-tile pathology — no pole degeneracy, no antimeridian
    * wrap, no per-band cos() widths — and floor() cell assignment
    * preserves it regardless of floating-point ulps (both endpoints
    * embed in the same engine). Every candidate is verified with the
    * exact haversine predicate, so blocking only prunes and the
    * DuckDB oracle states the plain θ-join.
    *
    * Scale shape: the left side explodes its 27-cell neighborhood
    * (3 sequence explodes over id+cell+coords rows — metadata-wide,
    * never payload), then ONE equi-join on the cell triple with
    * `id_a < id_b`; each qualifying pair is emitted exactly once (a
    * unique offset matches), so no distinct pass. Candidate volume is
    * pairs-per-occupied-neighborhood, ~0.4% of the cross product at
    * r = 500 km; dense-city hot cells compose with
    * [[Layout.capBuckets]] upstream if a cell outgrows memory.
    *
    * Output: (pid_a, pid_b, km) with km 6dp-rounded, pid_a < pid_b.
    */
  def geoRadiusSelfJoin(points: DataFrame, idCol: String,
                        latCol: String, lonCol: String,
                        radiusKm: Double): DataFrame =
    geoRadiusSelfJoinImpl(points, idCol, latCol, lonCol, radiusKm,
      persist = false).df

  /** [[geoRadiusSelfJoin]] with the embedded point frame persisted
    * (both join sides read it — 27-offset left and plain right) and
    * handed back for release — the form the bench queries run. The
    * plain form is unhinted: leak-free, re-running the trig embedding
    * once per side.
    */
  def geoRadiusSelfJoinCached(points: DataFrame, idCol: String,
                              latCol: String, lonCol: String,
                              radiusKm: Double): Cached =
    geoRadiusSelfJoinImpl(points, idCol, latCol, lonCol, radiusKm,
      persist = true)

  private def geoRadiusSelfJoinImpl(points: DataFrame, idCol: String,
                                    latCol: String, lonCol: String,
                                    radiusKm: Double,
                                    persist: Boolean): Cached = {
    require(radiusKm > 0.0, "radiusKm must be positive")
    val earthR = 6371.0
    val chord = 2.0 * earthR * math.sin(radiusKm / (2.0 * earthR))
    val toRad = math.Pi / 180.0
    val p = points
      .filter(col(idCol).isNotNull && col(latCol).isNotNull &&
        col(lonCol).isNotNull)
      .select(col(idCol).as("__pid"),
        col(latCol).cast("double").as("__lat"),
        col(lonCol).cast("double").as("__lon"))
      .withColumn("__cx", floor(
        cos(col("__lat") * toRad) * cos(col("__lon") * toRad) * earthR
          / chord).cast("long"))
      .withColumn("__cy", floor(
        cos(col("__lat") * toRad) * sin(col("__lon") * toRad) * earthR
          / chord).cast("long"))
      .withColumn("__cz", floor(
        sin(col("__lat") * toRad) * earthR / chord).cast("long"))
      .transform(d =>
        if (persist) d.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else d)
    val l27 = p
      .withColumn("__ox", explode(sequence(lit(-1), lit(1))))
      .withColumn("__oy", explode(sequence(lit(-1), lit(1))))
      .withColumn("__oz", explode(sequence(lit(-1), lit(1))))
      .select(col("__pid").as("__pa"), col("__lat").as("__la"),
        col("__lon").as("__na"),
        (col("__cx") + col("__ox")).as("__jx"),
        (col("__cy") + col("__oy")).as("__jy"),
        (col("__cz") + col("__oz")).as("__jz"))
    val km = haversineKm(col("__la"), col("__na"),
      col("__lat"), col("__lon"))
    val out = l27.join(p,
        col("__jx") === col("__cx") && col("__jy") === col("__cy") &&
          col("__jz") === col("__cz") && col("__pa") < col("__pid"))
      .withColumn("__km", km)
      .filter(col("__km") <= radiusKm)
      .select(col("__pa").as("pid_a"), col("__pid").as("pid_b"),
        round(col("__km"), 6).as("km"))
    Cached(out, if (persist) Seq(p) else Seq.empty)
  }
}
