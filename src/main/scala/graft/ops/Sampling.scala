package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (beyond the
  * reference surface).
  *
  * `rand()`-based sampling resamples on every run, cluster layout, and
  * retry — poison for incremental corpus builds, ablations, and
  * train/eval splits that must never leak rows across reruns. These
  * operators decide each row's fate as a pure function of its id:
  * stable under reruns, repartitioning, appends, and engine migration.
  *
  * Two hash modes: `portable = false` (default) keys on XXH64 — one
  * codegen'd long hash per row, the 100 TB path; `portable = true` keys
  * on the md5 hex digest of the id string — ~20× slower per row but
  * bit-reproducible across engines (any SQL engine with md5 selects the
  * identical sample), which is what you want when a sample definition
  * outlives the engine that drew it. The DuckDB oracle checks the
  * portable mode; the XXH64 mode is spec-gated.
  */
object Sampling {

  private val M = 1000000L // fraction granularity: 1e-6

  private def xxKey(idCol: String, seed: Long): Column =
    pmod(xxhash64(col(idCol), lit(seed)), lit(M))

  /** Portable digest input: `"<seed>:<id>"` — the seed participates in
    * portable mode too (callers drawing two samples with two seeds get
    * two different samples, same as XXH64 mode; any engine restates
    * `md5(seed || ':' || id)`). Seed 42 is the suite's pinned default,
    * so every oracle writes `md5('42:' || ...)`.
    */
  private def md5Input(idCol: String, seed: Long): Column =
    concat(lit(s"$seed:"), col(idCol).cast("string")).cast("binary")

  /** 32-bit value of the first 8 md5-hex chars, as fixed-width hex text
    * (lexicographic order == numeric order).
    */
  private def md5Key(idCol: String, seed: Long): Column =
    substring(md5(md5Input(idCol, seed)), 1, 8)

  private def md5Threshold(fraction: Double): String =
    f"${math.floor(fraction * 4294967296.0).toLong}%08x"

  /** Keep ~`fraction` of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    // fraction 1.0 would overflow the 8-hex-digit threshold ("100000000"
    // compares lexicographically BELOW most keys) — short-circuit it
    if (fraction >= 1.0) df
    else if (portable)
      df.filter(md5Key(idCol, seed) < lit(md5Threshold(fraction)))
    else
      df.filter(xxKey(idCol, seed) < (fraction * M).toLong)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A-ES): keep the k rows with the largest priority
    * u^(1/w) — equivalently the largest ln(u)/w — where u is the row's
    * deterministic id-hash uniform and w its weight column (tokens,
    * bytes, quality score). Inclusion probability is proportional to
    * weight, each row drawn at most once, and — unlike
    * `sampleBy`/`rand()` — the draw is a pure function of (id, weight):
    * rerun-, layout-, and (portable mode) engine-stable, so a token-
    * weighted corpus subsample is reproducible years later.
    *
    * u is built EXACTLY in both engines: the top 52 bits of the id hash
    * (13 md5-hex chars in portable mode, the low 52 XXH64 bits
    * otherwise) as integer v, then u = (v + 0.5) / 2^52 — a strictly-
    * in-(0,1) double with no parse ambiguity, so the single
    * transcendental ln(u) is the only cross-engine ulp surface (the
    * t10/t12 precedent; ranking flips need two priorities within one
    * ulp, which distinct 52-bit uniforms make negligible — and the
    * oracle checks the actual kept SET, so any flip fails loudly).
    *
    * Selection is sort-free at scale: top-k by (priority, id) runs as
    * TakeOrderedAndProject — per-partition size-k heaps merged on the
    * driver, no global sort, no window. Rows with weight ≤ 0 or null
    * never qualify (they cannot be "drawn" under A-ES semantics).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long = 42L,
                     portable: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive: got $k")
    val v =
      if (portable)
        conv(substring(md5(md5Input(idCol, seed)),
          1, 13), 16, 10).cast("long")
      else
        xxhash64(col(idCol).cast("string"), lit(seed))
          .bitwiseAND(lit((1L << 52) - 1))
    val u = (v.cast("double") + 0.5) / lit(4503599627370496.0) // 2^52
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__pri", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__pri").desc, col(idCol))
      .limit(k)
      .drop("__pri")
  }

  /** [[weightedSample]] per stratum: the n heaviest-priority rows of
    * EACH group (language quotas, per-domain caps — weighted). Ranking
    * is the same A-ES priority; selection runs on the bounded
    * mergeable [[graft.functions.TopKAgg]] heap — map-side size-n
    * buffers per stratum, no per-group `row_number` window funneling a
    * hot stratum through one reducer (the sm09/ANN-finisher
    * discipline). Output: (group, id, rank), rank 1..n by
    * (priority desc, id asc).
    */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String,
                             idCol: String, weightCol: String, n: Int,
                             seed: Long = 42L,
                             portable: Boolean = false): DataFrame = {
    require(n > 0, s"n must be positive: got $n")
    val v =
      if (portable)
        conv(substring(md5(md5Input(idCol, seed)),
          1, 13), 16, 10).cast("long")
      else
        xxhash64(col(idCol).cast("string"), lit(seed))
          .bitwiseAND(lit((1L << 52) - 1))
    val u = (v.cast("double") + 0.5) / lit(4503599627370496.0) // 2^52
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__pri", log(u) / col(weightCol).cast("double"))
      .groupBy(col(groupCol).as("grp"))
      .agg(graft.functions.TopKAgg.topK(col("__pri"), col(idCol), n)
        .as("__tk"))
      .select(col("grp"), explode(col("__tk")).as("__e"))
      .select(col("grp"), col("__e.id").as("id"),
        col("__e.rank").as("rank"))
  }

  /** Deterministic train/validation/test split assignment: each row's
    * bucket is a pure function of its id hash, so the split never leaks
    * rows across reruns, appends, repartitions, or engines (portable
    * mode) — the property `randomSplit` cannot give an evolving corpus.
    * `fractions` are (name, weight) pairs; weights normalize to 1 and
    * carve consecutive hash ranges in the given order.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)],
                  splitCol: String = "split", seed: Long = 42L,
                  portable: Boolean = false): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    val total = fractions.map(_._2).sum
    // cumulative upper bounds over the hash range, last pinned to 1.0
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(_ / total).dropRight(1)
    val key =
      if (portable) md5Key(idCol, seed)
      else xxKey(idCol, seed)
    val assigned = fractions.init.zip(bounds).foldRight(
      lit(fractions.last._1)) { case (((name, _), hi), elseCol) =>
      val cond =
        if (portable) key < lit(md5Threshold(hi))
        else key < lit(math.floor(hi * M).toLong)
      when(cond, name).otherwise(elseCol)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Deterministic corpus mixing: sample each source down so the result
    * matches `weights`' proportions at the LARGEST feasible total (the
    * binding source — the one scarcest relative to its weight — keeps
    * everything; the rest hash-sample down). The data-mixture op every
    * training pipeline runs before tokenization, with hash-gated row
    * fate: stable under reruns, appends of non-binding sources, and
    * engines (portable mode). Sources absent from `weights` drop.
    *
    * The per-source counts collect to the driver — bounded by source
    * cardinality (languages/domains), the justified-collect shape.
    */
  def mixCorpus(df: DataFrame, sourceCol: String, idCol: String,
                weights: Map[String, Double], seed: Long = 42L,
                portable: Boolean = false): DataFrame = {
    val counts = df
      .filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mixWithCounts(df, sourceCol, idCol, weights, counts, seed, portable)
  }

  private def mixWithCounts(df: DataFrame, sourceCol: String, idCol: String,
                            weights: Map[String, Double],
                            counts: Map[String, Long], seed: Long,
                            portable: Boolean): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(counts.nonEmpty, "no rows match any weighted source")
    // feasible scale k: total output size such that every source can
    // supply its share; fraction_s = k·w_s / n_s ∈ (0, 1]
    val k = weights.collect {
      case (s, w) if counts.contains(s) => counts(s) / w
    }.min
    val key = if (portable) md5Key(idCol, seed) else xxKey(idCol, seed)
    val cond = weights.toSeq.sortBy(_._1).flatMap { case (s, w) =>
      counts.get(s).map { n =>
        val f = k * w / n
        // the binding source's fraction is ~1.0 up to FP jitter: keep
        // every row rather than compare against a 9-hex threshold
        if (f >= 1.0) col(sourceCol) === s
        else if (portable)
          col(sourceCol) === s && key < lit(md5Threshold(f))
        else
          col(sourceCol) === s && key < lit(math.floor(f * M).toLong)
      }
    }.reduce(_ || _)
    df.filter(cond)
  }

  /** Temperature-smoothed corpus mixing (the multilingual-pretraining
    * recipe — XLM-R's α-smoothing): target proportions ∝ n_s^alpha
    * instead of the observed n_s, flattening dominant sources and
    * boosting the tail as alpha → 0 (alpha = 1 reproduces the corpus
    * as-is; alpha = 0 equalizes sources). Weights derive from one
    * grouped count (driver-bounded by the number of sources) and feed
    * [[mixCorpus]] unnormalized — mixCorpus's feasible-scale math is
    * scale-invariant in the weights, so no normalization float ops
    * enter the row-fate thresholds. alpha = 0.5 computes via sqrt
    * (correctly-rounded IEEE, engine-portable for the oracle); other
    * alphas use pow. The counts collected for the weights feed the
    * mix directly — one grouped count job total, not one here and a
    * second inside [[mixCorpus]].
    */
  def mixCorpusTemperature(df: DataFrame, sourceCol: String, idCol: String,
                           alpha: Double, seed: Long = 42L,
                           portable: Boolean = false): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1], got $alpha")
    // null-source rows drop, matching mixCorpus's absent-source rule —
    // and they must not enter the counts either: a null key's weight
    // would distort the feasible-scale k for every REAL source while
    // its own predicate (=== null) could never match a row
    val counts = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty corpus")
    val weights = counts.map { case (s, n) =>
      s -> (if (alpha == 0.5) math.sqrt(n.toDouble)
            else math.pow(n.toDouble, alpha))
    }
    mixWithCounts(df, sourceCol, idCol, weights, counts, seed, portable)
  }

  /** Deterministic pseudorandom corpus shuffle, materialized the way a
    * distributed pipeline actually writes one: each row hash-assigns to
    * a shard, then orders WITHIN its shard by its hash key. Reading
    * shards in label order and rows in (shard, pos) order replays one
    * global pseudorandom permutation of the corpus — but no global sort
    * or single-partition window ever runs: the per-shard `row_number`
    * windows are independent and parallel (the training-shuffle layout
    * every epoch-assembly job needs; `ORDER BY rand()` re-deals per
    * run and funnels a global sort).
    *
    * Portable mode shards on the first `shardChars` md5-hex chars of
    * the id (16^shardChars shards, labels are the hex prefixes) and
    * orders by the full digest — any engine with md5 replays the
    * identical permutation. Fast mode shards on XXH64.
    */
  def shuffleShards(df: DataFrame, idCol: String, shardChars: Int = 2,
                    seed: Long = 42L, portable: Boolean = false,
                    shardCol: String = "shard",
                    posCol: String = "pos"): DataFrame = {
    require(shardChars >= 1 && shardChars <= 8,
      s"shardChars in [1,8], got $shardChars")
    // both modes key on fixed-width lowercase hex so the shard label
    // is a uniform prefix and lexicographic order == numeric order
    val key =
      if (portable) md5(md5Input(idCol, seed))
      else lpad(lower(hex(xxhash64(col(idCol), lit(seed)))), 16, "0")
    val keyed = df.withColumn("__key", key)
      .withColumn(shardCol, substring(col("__key"), 1, shardChars))
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col("__key"), col(idCol))
    keyed.withColumn(posCol, row_number().over(w).cast("long"))
      .drop("__key")
  }

  /** Deterministic budget fill: keep rows in id-hash order until the
    * cumulative `costCol` (token counts, bytes) reaches `budget` — the
    * "give me a pseudorandom ~N-token subset" op every epoch-assembly
    * and ablation pipeline runs. Keeps every row whose running total
    * INCLUDING itself is ≤ budget (greedy fill; the first overflowing
    * row is dropped, nothing after it can enter).
    *
    * The running total uses [[Aggregates.bucketedPrefixSums]] — the
    * partition-parallel windowless prefix-sum machinery — so there is
    * no global sort or single-partition window; row fate is stable
    * under reruns, appends... with the usual caveat that appending
    * rows can displace earlier picks near the boundary (the budget is
    * global, unlike [[hashSample]]'s per-row fate). Keys are 48-bit
    * hash prefixes (doubles order them exactly below 2^53); a key
    * collision only matters when the budget boundary falls between the
    * tied rows.
    */
  def sampleToBudget(df: DataFrame, idCol: String, costCol: String,
                     budget: Long, seed: Long = 42L,
                     portable: Boolean = false): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val key =
      if (portable)
        conv(substring(md5(md5Input(idCol, seed)), 1, 12),
          16, 10).cast("long")
      else pmod(xxhash64(col(idCol), lit(seed)), lit(1L << 48))
    val keyed = df.withColumn("__ord", key)
    Aggregates.bucketedPrefixSums(keyed, "__ord", ascending = true,
        Seq(costCol))
      .filter(col(s"cum_$costCol") <= budget)
      .drop("__ord", s"cum_$costCol")
  }

  /** Temporal train/test split with an embargo band — the leakage-safe
    * split time-series/fraud ML needs (evaluate strictly on the FUTURE;
    * rows whose trailing-window features would peek across the boundary
    * sit in a discardable embargo band — the "purged" split of
    * financial ML, e.g. López de Prado 2018 ch.7).
    *
    * The boundary is the first time value whose cumulative count
    * reaches ceil(N·num/den) — an exact INTEGER first-rank rule over
    * the windowless prefix-sum machinery (the w07/a26 discipline): no
    * percentile interpolation, so any engine restates the same
    * boundary. Labels: `t <= thr − embargo` → train, `t > thr` → test,
    * between → embargo; a NULL timestamp gets a NULL split (time-less
    * rows are excluded from the boundary computation and belong to no
    * temporal side — the caller decides their fate explicitly). Two
    * aggregation barriers (histogram + rank rule, N), threshold
    * re-enters the plan as a broadcast one-row frame — no driver
    * collect, shuffle bounded by distinct time values.
    */
  def temporalSplit(df: DataFrame, tsCol: String,
                    pctNum: Int = 4, pctDen: Int = 5,
                    embargoMicros: Long = 0L,
                    splitCol: String = "split"): DataFrame = {
    require(pctDen > 0 && pctNum >= 0 && pctNum <= pctDen,
      s"need 0 <= num/den <= 1, got $pctNum/$pctDen")
    require(embargoMicros >= 0, "embargo must be >= 0")
    // the embargo arithmetic and the rank rule assume a numeric epoch
    // column; on TimestampType `ts - embargoMicros` is interval math
    // with different semantics (and different oracle restatements) —
    // route clock columns through Tables.tsMicros/eventsMicros first
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => ()
      case other => throw new IllegalArgumentException(
        s"temporalSplit needs an integral epoch tsCol (got $other for " +
          s"'$tsCol') — convert timestamps with Tables.tsMicros first")
    }
    val vals = df.filter(col(tsCol).isNotNull)
      .groupBy(col(tsCol)).agg(count(lit(1)).as("__cnt"))
    val cum = Aggregates.bucketedPrefixSums(vals, tsCol, ascending = true,
      sumCols = Seq("__cnt"))
    val total = vals.agg(sum(col("__cnt")).as("__N"))
    val thr = cum.crossJoin(broadcast(total))
      .filter(expr(s"cum___cnt >= (__N * $pctNum + ${pctDen - 1}) div $pctDen"))
      .agg(min(col(tsCol)).as("__thr"))
    df.crossJoin(broadcast(thr))
      .withColumn(splitCol,
        when(col(tsCol).isNull, lit(null).cast("string"))
          .when(col(tsCol) <= col("__thr") - embargoMicros, "train")
          .when(col(tsCol) > col("__thr"), "test")
          .otherwise("embargo"))
      .drop("__thr")
  }

  /** Exactly min(n, |stratum|) rows per stratum, chosen in id-hash order
    * (a deterministic per-group random sample; ties broken by id). The
    * per-stratum window parallelizes across strata; a single giant
    * stratum is the salting case — or [[capPerGroup]], the window-free
    * form of this operator.
    */
  def stratifiedTake(df: DataFrame, strataCol: String, idCol: String,
                     n: Int, seed: Long = 42L,
                     portable: Boolean = false): DataFrame = {
    val key = if (portable) md5Key(idCol, seed) else xxKey(idCol, seed)
    val w = Window.partitionBy(col(strataCol)).orderBy(key, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Window-free scale path for [[stratifiedTake]] — the per-domain cap
    * crawl pipelines apply before mixing (at most `n` documents per
    * domain/source, deterministically by id hash). Selection runs
    * through the bounded mergeable top-k aggregate
    * ([[graft.functions.TopKAgg]], the ANN-finisher machinery): each
    * map partition keeps a size-n heap per stratum, so a hot stratum —
    * one domain being half the crawl — compacts map-side to n
    * candidates per partition instead of sorting ALL its rows through
    * one reducer task, which is how the window form dies at 100 TB.
    * The survivor id set then prunes the corpus with a semi-join whose
    * build side is bounded by n × |strata| (AQE broadcasts it when
    * small).
    *
    * Selection order (hash key asc, id asc) is identical to
    * [[stratifiedTake]] — spec-gated equal, portable and XXH64 modes.
    * Divergences from the window form, by construction of the
    * aggregate: rows with a NULL stratum or NULL id are dropped, not
    * sampled (a window treats null as one more partition; here the
    * semi-join can't match them). `idCol` must be long/int/string.
    */
  def capPerGroup(df: DataFrame, strataCol: String, idCol: String,
                  n: Int, seed: Long = 42L,
                  portable: Boolean = false): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    // numeric value of the 32-bit md5 prefix: ordering ≡ md5Key's
    // fixed-width-hex lexicographic order (TopKAgg scores are numeric)
    val key =
      if (portable) conv(md5Key(idCol, seed), 16, 10).cast("long")
      else xxKey(idCol, seed)
    val kept = df.groupBy(col(strataCol))
      .agg(graft.functions.TopKAgg.topK(key, col(idCol), n,
        largest = false).as("__tk"))
      .select(col(strataCol), explode(col("__tk.id")).as(idCol))
    df.join(kept, Seq(strataCol, idCol), "left_semi")
  }
}
