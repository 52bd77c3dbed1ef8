package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline: queries are a
  * small broadcast side, so the "cross join" is a broadcast
  * nested-loop — each executor scans its partition of the corpus once
  * per query batch; no shuffle of the corpus. The IVF variant is the
  * scale path: a KMeans coarse quantizer prunes the scan to nprobe
  * clusters (shuffle on cluster id only).
  */
object Similarity {

  /** Dot product of two double arrays — a codegen'd primitive loop
    * (`graft.functions.DotProduct`); sequential fold, so results equal
    * the HOF form and DuckDB's list_dot_product exactly.
    */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayMath.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, 0.0).otherwise(dot(a, b) / denom)
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** The ANN finisher: per-query top-k via the bounded mergeable
    * [[graft.functions.TopKAgg]] instead of a
    * `row_number().over(partitionBy(query_id))` window. The window
    * funnels every scored candidate for one query through ONE reducer
    * task — O(|corpus|) rows per task for brute force, the
    * single-partition bottleneck at 100 TB. The aggregate keeps a
    * size-k heap per query on the map side, so each partition ships at
    * most k rows per query into the final merge. Ordering (score desc,
    * id asc, ties included) is identical to the window it replaces —
    * n01/n07 stay hash-exact against the oracle's ROW_NUMBER.
    */
  private def topKFinish(scored: DataFrame, scoreName: String,
                         k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col(scoreName), col("vec_id"), k)
        .as("__tk"))
      .select(col("query_id"), explode(col("__tk")).as("__e"))
      .select(col("query_id"), col("__e.id").as("vec_id"),
        col("__e.score").as(scoreName), col("__e.rank").as("rank"))

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors. `queries` must be small (it broadcasts).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms computed once per row/query, not once per pair; the corpus
    // side fans out so the broadcast-NL scan isn't one task on a
    // single-row-group file
    val c = Layout.fanOut(corpus).select(col(idCol).as("vec_id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("nq", norm(col("qv")))
    val scoredAll = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        when(col("nv") * col("nq") === 0, 0.0)
          .otherwise(dot(col("v"), col("qv")) / (col("nv") * col("nq"))))
    topKFinish(scoredAll, "cos", k)
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the k most-similar corpus vectors with a DIFFERENT label — the
    * near-miss examples that make a contrastive or reranker objective
    * informative (easy negatives contribute ~zero gradient). Same
    * broadcast-NL + bounded mergeable top-k shape as
    * [[bruteForceTopK]]; the label predicate runs inside the scan, so
    * same-label candidates never reach scoring.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = Layout.fanOut(corpus).select(col(idCol).as("vec_id"),
        col(labelCol).as("__cl"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
    val q = queries.select(col(idCol).as("query_id"),
        col(labelCol).as("__ql"), asDouble(col(vecCol)).as("qv"))
      .withColumn("nq", norm(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id") &&
        !(col("__cl") <=> col("__ql")))
      .withColumn("cos",
        when(col("nv") * col("nq") === 0, 0.0)
          .otherwise(dot(col("v"), col("qv")) / (col("nv") * col("nq"))))
    topKFinish(scored, "cos", k)
  }

  // ---------- scalar quantization (SQ8) ----------

  /** Per-dimension [min,max] bounds of an embedding column, as a
    * dim-row frame ("pos","lo","hi"). posexplode spreads the vector
    * dimension across the shuffle (the [[groupCentroids]] layout
    * argument), so wide embeddings never concentrate a reducer.
    */
  def dimensionBounds(df: DataFrame, vecCol: String): DataFrame =
    Layout.fanOut(df)
      .select(posexplode(asDouble(col(vecCol))).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))

  /** Int8 scalar quantization (the FAISS SQ8 recipe): each dimension
    * affinely maps its corpus [lo,hi] onto [-127,127]; constant
    * dimensions code to 0. Cuts an f32 embedding store 4× and turns
    * similarity into integer math — the standard first rung of
    * vector-index compression. `floor(x + 0.5)` instead of `round()`
    * because round-half tie rules differ across engines and this
    * pipeline is oracle-checked end-to-end; every other step is exact
    * integer or correctly-rounded IEEE double arithmetic, so the codes
    * are engine-identical.
    *
    * The per-dimension bounds come back to the driver as two
    * `dim`-sized arrays (bounded by embedding width, never by rows —
    * the IVF-sample precedent) and re-enter the plan as array
    * literals, keeping quantization a pure codegen row-local
    * projection with no join in the hot path.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String,
                   bounds: DataFrame): DataFrame = {
    val b = bounds.orderBy(col("pos")).collect()
    quantizeWithArrays(df, idCol, vecCol,
      b.map(_.getDouble(1)), b.map(_.getDouble(2)))
  }

  /** Quantize against already-collected per-dim bounds — lets one
    * bounds job serve several frames (corpus + queries in
    * [[quantizedTopK]]).
    */
  private def quantizeWithArrays(df: DataFrame, idCol: String,
                                 vecCol: String, lo: Array[Double],
                                 hi: Array[Double]): DataFrame = {
    val loC = typedLit(lo)
    val hiC = typedLit(hi)
    df.select(col(idCol),
      transform(asDouble(col(vecCol)), (x, i) => {
        val l = element_at(loC, i + 1)
        val h = element_at(hiC, i + 1)
        // clamp before scaling (the FAISS SQ clip): a value outside the
        // TRAINING bounds — a query vector, or corpus drift — must code
        // to ±127, not escape the int8 range
        val xc = greatest(least(x, h), l)
        when(h === l, lit(0))
          .otherwise(floor((xc - l) / (h - l) * 254.0 + lit(0.5))
            .cast("int") - 127)
      }).as("codes"))
  }

  /** Integer dot product of two int8 code arrays (long accumulator). */
  def codeDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** ANN top-k over int8-quantized codes: queries quantize into the
    * CORPUS's code space (as a production SQ index does), score by
    * integer dot product, rank per query with a deterministic id
    * tie-break. Integer scores make the whole pipeline — bounds,
    * codes, scores, ranks — engine-exact, which is what puts a
    * quantized ANN path on a hash-checked oracle (n07). Same
    * broadcast-queries × fanned-corpus shape as [[bruteForceTopK]].
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    // ONE bounds job serves both sides — quantizeInt8 per side would
    // re-run the full-corpus min/max aggregation for the query frame
    val b = dimensionBounds(corpus, vecCol).orderBy(col("pos")).collect()
    require(b.nonEmpty,
      "quantizedTopK: empty corpus — no bounds to quantize against " +
        "(an empty bounds array would make every query row's " +
        "element_at lookup fail under ANSI)")
    val lo = b.map(_.getDouble(1))
    val hi = b.map(_.getDouble(2))
    val c = Layout.fanOut(quantizeWithArrays(corpus, idCol, vecCol, lo, hi))
      .select(col(idCol).as("vec_id"), col("codes").as("cv"))
    val q = quantizeWithArrays(queries, idCol, vecCol, lo, hi)
      .select(col(idCol).as("query_id"), col("codes").as("cq"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", codeDot(col("cv"), col("cq")))
    topKFinish(scored, "score", k)
  }

  /** Per-group embedding centroid (mean vector) — cluster/class
    * profiling for embedding pipelines. `posexplode` spreads the vector
    * DIMENSION across the shuffle too, so partial sums aggregate
    * (group, position) cells — a wide embedding column never
    * concentrates one reducer — and the ordered re-assembly sorts each
    * group's positions back into an array (struct sort is by leading
    * field, i.e. position).
    */
  def groupCentroids(df: DataFrame, groupCol: String,
                     vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "v")))
      .groupBy(col("grp"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("grp"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), (col("s") / col("n"))
          .as("m")))),
        x => x.getField("m")).as("centroid"))

  /** Order-forced centroid variant for engine-exact verification:
    * per (group, position) the component values fold-sum in ascending
    * `idCol` order — a sequential double fold, the same trick that
    * makes the cosine queries hash-match DuckDB (`list_dot_product` ≡
    * left fold; decimal casts of floats are NOT engine-identical, the
    * two engines round binary→decimal differently). `collect_list` per
    * cell bounds memory by group size × 1 dimension, fine for
    * verification corpora; [[groupCentroids]] (partial-sum shuffle,
    * order-free) is the 100 TB operator this one certifies.
    */
  def groupCentroidsOrdered(df: DataFrame, groupCol: String, idCol: String,
                            vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), col(idCol).as("id"),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "v")))
      .groupBy(col("grp"), col("pos"))
      .agg(count(lit(1)).as("n"),
        aggregate(array_sort(collect_list(struct(col("id"), col("v")))),
          lit(0.0), (acc, x) => acc + x.getField("v")).as("s"))
      .select(col("grp"), col("pos"), (col("s") / col("n")).as("mean"))

  /** Upper-triangle covariance matrix of an embedding column — the
    * whitening / PCA precursor (dominant-direction removal is the
    * standard post-processing for sentence embeddings). Returns one row
    * per cell (i ≤ j): `cov = E[x_i·x_j] − E[x_i]·E[x_j]`.
    *
    * Scale shape: cell products are generated scan-locally (dim²/2
    * structs per row via a HOF — no positional self-join of the
    * exploded corpus, which would shuffle rows × dim twice), then
    * partial-aggregated in the same stage; the shuffle carries at most
    * dim²/2 (i,j,sum) cells per map partition, never rows. Dimension
    * means are a second scan-local pass; the dim-row means frame
    * broadcasts into the finish. Sums are order-free doubles — the
    * production spelling; [[covarianceMatrixOrdered]] is the
    * engine-exact verification twin that certifies it.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val base = Layout.fanOut(df).select(asDouble(col(vecCol)).as("__v"))
    val cells = base.select(explode(flatten(transform(
        sequence(lit(0), lit(dim - 1)), i =>
          transform(sequence(i, lit(dim - 1)), j =>
            struct(i.cast("int").as("i"), j.cast("int").as("j"),
              (element_at(col("__v"), i + 1) *
                element_at(col("__v"), j + 1)).as("p")))))).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p")).as("sxy"), count(lit(1)).as("n"))
    val means = base.select(posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(sum(col("x")).as("s"))
    cells
      .join(broadcast(means.select(col("pos").as("i"), col("s").as("si"))),
        "i")
      .join(broadcast(means.select(col("pos").as("j"), col("s").as("sj"))),
        "j")
      .select(col("i"), col("j"),
        (col("sxy") / col("n") -
          (col("si") / col("n")) * (col("sj") / col("n"))).as("cov"))
  }

  /** Order-forced covariance variant for engine-exact verification —
    * the [[groupCentroidsOrdered]] pattern: every per-cell product sum
    * and every dimension mean folds in ascending `idCol` order
    * (sequential double fold ≡ DuckDB list_dot_product), so the final
    * `sxy/n − (si/n)(sj/n)` doubles are engine-identical with no
    * rounding. `collect_list` per cell bounds memory by corpus rows —
    * verification corpora only; [[covarianceMatrix]] is the 100 TB
    * operator this one certifies.
    */
  def covarianceMatrixOrdered(df: DataFrame, idCol: String,
                              vecCol: String): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val base = df.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
    val cells = base.select(col("__id"), explode(flatten(transform(
        sequence(lit(0), lit(dim - 1)), i =>
          transform(sequence(i, lit(dim - 1)), j =>
            struct(i.cast("int").as("i"), j.cast("int").as("j"),
              (element_at(col("__v"), i + 1) *
                element_at(col("__v"), j + 1)).as("p")))))).as("c"))
      .select(col("__id"), col("c.i").as("i"), col("c.j").as("j"),
        col("c.p").as("p"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        aggregate(array_sort(collect_list(struct(col("__id"), col("p")))),
          lit(0.0), (acc, x) => acc + x.getField("p")).as("sxy"))
    val means = base
      .select(col("__id"), posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(aggregate(array_sort(collect_list(struct(col("__id"), col("x")))),
        lit(0.0), (acc, x) => acc + x.getField("x")).as("s"))
    cells
      .join(broadcast(means.select(col("pos").as("i"), col("s").as("si"))),
        "i")
      .join(broadcast(means.select(col("pos").as("j"), col("s").as("sj"))),
        "j")
      .select(col("i"), col("j"),
        (col("sxy") / col("n") -
          (col("si") / col("n")) * (col("sj") / col("n"))).as("cov"))
  }

  /** Top principal component by POWER ITERATION over a covariance cell
    * frame — the dimensionality-reduction step an embedding pipeline
    * runs before indexing (PCA-whiten → SQ8/PQ compress better, ANN
    * recall per byte rises; Jégou et al. 2011 §IV.A motivates exactly
    * this pre-rotation). Factored like [[lofFromKnn]]: the ALGEBRA
    * takes any `(i, j, cov)` upper-triangle frame, so the hash-exact
    * twin feeds it from [[covarianceMatrixOrdered]] while the 100-TB
    * path feeds the same iteration from [[covarianceMatrix]] — the
    * corpus-sized work (one scan to dim²/2 cells) happens BEFORE this
    * operator; everything here is bounded by dim², never by rows.
    *
    * Determinism: cells are 7dp-rounded into exact decimals; each
    * round's matvec sums `round(c·v, 7)` as DECIMAL(27,7) (order-free,
    * exact), the norm is one sqrt over an exact decimal sum of squares,
    * and the refreshed vector re-rounds to 7dp — so both engines walk
    * the identical orbit and the oracle replays every round as a CTE
    * pair. v₀ = 0.1234567 uniform — nonzero projection on any dominant
    * eigenvector not exactly ⟂ to 1 (the standard seeding caveat; a
    * zero-overlap start is measure-zero and surfaces as
    * non-convergence in the spec gate, not silent corruption), and
    * deliberately FULL-MANTISSA: a dyadic seed like 1/√64 = 0.125
    * makes round 1's products c/8, parking one cell in eight exactly
    * on the .5e-8 rounding boundary where HALF_UP (Spark) and
    * round-half-even (DuckDB) split — measured, not hypothetical. A
    * 7-digit seed coprime to 10⁷ leaves one boundary residue in 10⁷
    * (the suite-wide accepted risk class). The magnitude is arbitrary:
    * round 1's normalization rescales any uniform seed to the same
    * unit vector. The
    * eigenvector's SIGN is whatever the orbit converges to — callers
    * needing a canonical sign flip on a fixed loading.
    *
    * Output: one row per dimension `(i, loading)` plus the Rayleigh
    * eigenvalue `l1` and variance-explained ratio `evr = l1/trace`
    * (constant columns — the frame is dim rows, self-contained).
    *
    * Scale shape: `rounds` joins + 64-row aggregations over a
    * LOCAL-RELATION cell frame ([[Layout.materializeBounded]] pins the
    * dim²/2 cells once) — driver-bounded algebra, zero corpus scans.
    */
  /** Power-iteration seed — full 7-digit mantissa, coprime to 10⁷ (see
    * the [[pcaPowerFromCov]] boundary note); the oracle generator reads
    * the same constant.
    */
  val PcaSeed: Double = 0.1234567

  def pcaPowerFromCov(cov: DataFrame, rounds: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"rounds in [1,32], got $rounds")
    val spark = cov.sparkSession
    // dim² cells max — 64-dim embeddings = 2,080 upper cells; the 1<<20
    // bound admits dim ≤ ~1448 before falling back to the distributed
    // loop. Within the bound the cell frame was ALREADY driver-local
    // (materializeBounded pinned it since r11), so the r13 step is to
    // run the dim-bounded iteration AS driver decimal algebra — the
    // same valueOf/HALF_UP/decimal operations Spark's codegen performs
    // (PcaSpec pins path equality bit for bit) — instead of ~3 tiny
    // Spark jobs per round: the corpus-sized work (one scan to dim²/2
    // cells) happened upstream; nothing here is row-scale.
    val persisted = pcaPowerCells(cov)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = persisted.count()
    if (n <= (1L << 20)) {
      val rows = persisted.collect()
      persisted.unpersist(blocking = false)
      pcaPowerLocal(spark, rows, rounds)
    } else pcaPowerDistributed(persisted, rounds)
  }

  /** The 7dp-rounded, symmetrized `(i, j, c)` cell frame both
    * iteration paths consume — the PcaSpec path-equality A/B surface.
    * Indices cast to int up front: the docstring admits ANY (i,j,cov)
    * cell frame, so a caller's long-typed indices must not
    * ClassCastException at the dim read.
    */
  private[graft] def pcaPowerCells(cov: DataFrame): DataFrame = {
    val c7 = round(col("cov"), 7)
    val upper = cov.select(col("i").cast("int").as("i"),
      col("j").cast("int").as("j"), c7.as("c"))
    upper.union(
      cov.filter(col("i") =!= col("j"))
        .select(col("j").cast("int").as("i"),
          col("i").cast("int").as("j"), c7.as("c")))
  }

  /** The pre-r13 distributed iteration — the > 2²⁰-cell fallback (dim
    * ≳ 1448) and the reference [[pcaPowerLocal]] is spec-pinned
    * against. `cells` must be the [[pcaPowerCells]] frame, pinned or
    * persisted by the caller.
    */
  private[graft] def pcaPowerDistributed(cells: DataFrame,
                                         rounds: Int): DataFrame = {
    val spark = cells.sparkSession
    val dimRow = cells.agg(max(col("i"))).first()
    require(!dimRow.isNullAt(0),
      "pcaPowerFromCov: empty covariance frame (no cells)")
    val dim = dimRow.getInt(0) + 1
    val v0 = spark.createDataFrame(
      (0 until dim).map(i => (i, PcaSeed))).toDF("vi", "vl")
    def matvec(v: DataFrame): DataFrame =
      cells.join(v, cells("j") === v("vi"))
        .groupBy(col("i"))
        .agg(sum(round(col("c") * col("vl"), 7).cast("decimal(27,7)"))
          .as("w"))
    def normalize(w: DataFrame): DataFrame = {
      val nrm = w.agg(sqrt(sum((col("w").cast("decimal(18,7)") *
        col("w").cast("decimal(18,7)"))).cast("double")).as("nrm"))
      w.crossJoin(broadcast(nrm))
        .select(col("i").as("vi"),
          round(col("w").cast("double") / col("nrm"), 7).as("vl"))
    }
    // pin each round's dim-row vector as a local relation: the norm
    // branch and the next matvec both read it, and without the cut the
    // two-consumer plan doubles per round (2^rounds nodes). Only the
    // ROUND OUTPUT pins — w's two consumers re-derive the matvec from
    // the local v and the local cells, which is cheaper than a second
    // materialization job per round (A/B'd: 9.6 → ~6 s at sf0.1)
    val vFinal = (1 to rounds).foldLeft(v0)((v, _) =>
      Layout.materializeBounded(normalize(matvec(v)),
        maxRows = 1L << 20))
    val wFinal = matvec(vFinal)
    // Rayleigh quotient v'Cv on the unit-norm v: exact decimal sum of
    // 7dp-rounded per-dimension products
    val l1f = vFinal.join(wFinal, vFinal("vi") === wFinal("i"))
      .agg(sum(round(col("vl") * col("w").cast("double"), 7)
        .cast("decimal(18,7)")).cast("double").as("l1"))
    val trace = cells.filter(col("i") === col("j"))
      .agg(sum(col("c").cast("decimal(18,7)")).cast("double").as("tr"))
    vFinal.crossJoin(broadcast(l1f)).crossJoin(broadcast(trace))
      .select(col("vi").as("i"), col("vl").as("loading"),
        col("l1"), round(col("l1") / col("tr"), 7).as("evr"))
      .orderBy(col("i"))
  }

  /** Spark's codegen rounds a double as `java.math.BigDecimal
    * .valueOf(x).setScale(s, HALF_UP).doubleValue()` with NaN/Inf
    * passed through (RoundBase's double branch in 4.1.2 — the eval
    * path's `scala.math.BigDecimal(d)` builds from the same
    * `Double.toString` canonical form, so the two agree); this is
    * that operation verbatim, making driver-side replays of
    * 7dp-rounded pipelines bit-identical.
    */
  private[graft] def roundHalfUp7(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(7, java.math.RoundingMode.HALF_UP).doubleValue()

  /** [[pcaPowerDistributed]] replayed as driver decimal algebra over
    * the collected cell rows — operation-for-operation: each matvec
    * term is `round(c·v, 7)` then an exact scale-7 decimal (the
    * double→decimal(27,7) cast of an already-7dp double is exact);
    * sums are exact BigDecimal adds (order-free like Spark's decimal
    * sum); the norm squares at scale 14 (decimal(18,7)² ≡
    * BigDecimal.multiply on scale-7 values); every double re-entry
    * (÷nrm, sqrt, l1/tr) is the same IEEE op Spark executes. The
    * matched-key inner joins become presence flags so a sparse cell
    * frame drops exactly the rows Spark's joins would. PcaSpec pins
    * equality against [[pcaPowerDistributed]] and the n19/n20 oracles
    * pin it end-to-end.
    */
  private[graft] def pcaPowerLocal(spark: org.apache.spark.sql.SparkSession,
                                   rows: Array[org.apache.spark.sql.Row],
                                   rounds: Int): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    require(rows.nonEmpty,
      "pcaPowerFromCov: empty covariance frame (no cells)")
    val dim = rows.iterator.map(_.getInt(0)).max + 1
    // sum() skips null cells exactly like the frame aggregation
    val cells = rows.iterator.filter(r => !r.isNullAt(2))
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toArray
    def dec7(x: Double): JBD = JBD.valueOf(x).setScale(7, RM.HALF_UP)
    // one power round: w_i = Σ_j dec7(round7(c_ij·v_j)) over present j
    def matvec(v: Array[Double], present: Array[Boolean])
        : Array[JBD] = {
      val w = new Array[JBD](dim)
      var x = 0
      while (x < cells.length) {
        val (i, j, c) = cells(x)
        if (present(j)) {
          val t = dec7(roundHalfUp7(c * v(j)))
          w(i) = if (w(i) == null) t else w(i).add(t)
        }
        x += 1
      }
      w
    }
    var v = Array.fill(dim)(PcaSeed)
    var present = Array.fill(dim)(true)
    var r = 0
    while (r < rounds) {
      val w = matvec(v, present)
      var tot = JBD.ZERO
      var i = 0
      while (i < dim) {
        if (w(i) != null) tot = tot.add(w(i).multiply(w(i)))
        i += 1
      }
      val nrm = math.sqrt(tot.doubleValue())
      val nv = new Array[Double](dim)
      val np = new Array[Boolean](dim)
      i = 0
      while (i < dim) {
        if (w(i) != null) {
          nv(i) = roundHalfUp7(w(i).doubleValue() / nrm)
          np(i) = true
        }
        i += 1
      }
      v = nv; present = np; r += 1
    }
    val wF = matvec(v, present)
    var l1s = JBD.ZERO
    var tr = JBD.ZERO
    var i = 0
    while (i < dim) {
      if (present(i) && wF(i) != null)
        l1s = l1s.add(dec7(roundHalfUp7(v(i) * wF(i).doubleValue())))
      i += 1
    }
    var x = 0
    while (x < cells.length) {
      if (cells(x)._1 == cells(x)._2) tr = tr.add(dec7(cells(x)._3))
      x += 1
    }
    val l1 = l1s.doubleValue()
    val evr = roundHalfUp7(l1 / tr.doubleValue())
    val out = (0 until dim).filter(present)
      .map(i => org.apache.spark.sql.Row(i, v(i), l1, evr))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("loading",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("l1",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("evr",
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(java.util.Arrays.asList(out: _*), schema)
  }

  /** Per-dimension means by the ORDERED fold (ascending `idCol`
    * sequential double sum ≡ DuckDB `list_dot_product` over the sorted
    * list — the [[covarianceMatrixOrdered]] discipline), so the means
    * frame is engine-identical with no rounding. Verification corpora
    * only (collect_list bounds memory by rows); the production twin is
    * a plain sum/n aggregation. Output: `(pos, m)`.
    */
  def dimMeansOrdered(df: DataFrame, idCol: String,
                      vecCol: String): DataFrame = {
    val base = df.select(col(idCol).as("__id"),
      asDouble(col(vecCol)).as("__v"))
    val n = base.count()
    base.select(col("__id"), posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(aggregate(array_sort(collect_list(struct(col("__id"), col("x")))),
        lit(0.0), (acc, x) => acc + x.getField("x")).as("__s"))
      .select(col("pos"), (col("__s") / lit(n.toDouble)).as("m"))
  }

  /** Production twin of [[dimMeansOrdered]]: one order-free scan. */
  def dimMeans(df: DataFrame, vecCol: String): DataFrame = {
    val base = Layout.fanOut(df).select(asDouble(col(vecCol)).as("__v"))
    base.select(posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(col("x")).as("__s"), count(lit(1)).as("__n"))
      .select(col("pos"),
        (col("__s") / col("__n").cast("double")).as("m"))
  }

  /** PCA RECONSTRUCTION-ERROR outlier screen: per vector, the squared
    * distance to the line (mean + span of the top principal component)
    * — `resid = ‖x−μ‖² − (v·(x−μ))²` — the classic subspace-anomaly
    * score (an embedding far from the corpus' dominant direction is a
    * mislabeled/degenerate candidate). Composes the factored pieces:
    * `loadings` from [[pcaPowerFromCov]] (either covariance arm),
    * `means` from [[dimMeansOrdered]] (hash-exact twin) or
    * [[dimMeans]] (production) — the n16b composition pattern.
    *
    * Determinism: per-dimension squares and projections are 7dp-rounded
    * into DECIMAL(20,7) sums (order-free, exact); the final
    * `d2 − proj²` is one double chain, 7dp.
    *
    * Scale shape: one scan-local pass (posexplode + two broadcast
    * dim-row joins + hash agg per vector), TakeOrdered frontier —
    * nothing pair-shaped anywhere.
    *
    * Output: the `topK` largest-residual rows `(vec_id, resid)`.
    */
  def pcaResidualOutliers(df: DataFrame, idCol: String, vecCol: String,
                          loadings: DataFrame, means: DataFrame,
                          topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val ex = df.select(col(idCol).as("__id"),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .join(broadcast(means.select(col("pos"), col("m"))), Seq("pos"))
      .join(broadcast(loadings.select(col("i").as("pos"),
        col("loading").as("vl"))), Seq("pos"))
    val u = col("x") - col("m")
    ex.groupBy(col("__id"))
      .agg(sum(round(u * u, 7).cast("decimal(20,7)")).as("__d2"),
        sum(round(col("vl") * u, 7).cast("decimal(20,7)")).as("__pj"))
      .select(col("__id").as("vec_id"),
        round(col("__d2").cast("double") -
          col("__pj").cast("double") * col("__pj").cast("double"), 7)
          .as("resid"))
      .orderBy(col("resid").desc, col("vec_id").asc)
      .limit(topK)
  }

  /** Per-max-rank RBO contribution constants: item matched at joint
    * depth m contributes `Σ_{d=m..k} (1−p)·p^(d−1)/d` to the truncated
    * RBO sum. Generated driver-side at 7dp so BOTH engines sum
    * identical exact decimals — pow is not correctly rounded and would
    * otherwise be a cross-engine ulp surface.
    */
  def rboConstants(k: Int, p: Double): Seq[Double] = {
    val terms = (1 to k).map(d => (1.0 - p) * math.pow(p, d - 1) / d)
    (1 to k).map(m => BigDecimal(terms.drop(m - 1).sum)
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** RANK-BIASED OVERLAP (Webber, Moffat & Zobel, TOIS 2010),
    * truncated lower-bound form at depth k — the TOP-WEIGHTED
    * ranking-agreement metric the recall@k audit (n12) cannot express:
    * recall treats a hit at rank 1 and rank k identically, RBO weights
    * depth d by p^(d−1), so an index that finds the right items in the
    * wrong ORDER scores below one that preserves the head. The
    * infinite-tail extrapolation is dropped (this is RBO_min at k):
    * exact, deterministic, and the conservative bound an index audit
    * wants.
    *
    * Identity used: RBO_min = Σ_d w_d·A_d/d with A_d = |A[..d] ∩
    * B[..d]| collapses per MATCHED ITEM to the suffix constant
    * C(max(ra, rb)) — so the whole metric is one equi-join on
    * (query, item) + a k-entry literal lookup + an exact decimal sum.
    * No per-depth explode, no window.
    *
    * Both inputs must carry `(query_id, vec_id, rank)` with rank
    * 1-based and ≤ k (any [[topKFinish]]-shaped frame). Queries with
    * zero overlap emit rbo = 0 (left join from a's query set).
    *
    * Output per query: `(query_id, n_overlap, rbo)`, 7dp.
    */
  def rboTruncated(a: DataFrame, b: DataFrame, k: Int,
                   p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 100, s"k in [1,100], got $k")
    require(p > 0.0 && p < 1.0, s"p in (0,1), got $p")
    val consts = rboConstants(k, p)
    val aa = a.select(col("query_id"), col("vec_id"),
      col("rank").cast("int").as("__ra"))
    val bb = b.select(col("query_id").as("__qb"),
      col("vec_id").as("__vb"), col("rank").cast("int").as("__rb"))
    val matched = aa.join(bb,
        col("query_id") === col("__qb") && col("vec_id") === col("__vb"))
      .select(col("query_id"),
        element_at(array(consts.map(lit): _*),
          greatest(col("__ra"), col("__rb"))).as("__c"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("__c").cast("decimal(18,7)")).cast("double").as("__rbo"))
    aa.select(col("query_id")).distinct()
      .join(matched, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("__rbo"), lit(0.0)).as("rbo"))
      .orderBy(col("query_id"))
  }

  /** A trained coarse quantizer: just its centroids. */
  case class IvfModel(centroids: Array[Array[Double]])

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** kmeans++ seeding: each next centroid is drawn with probability
    * ∝ squared distance to the nearest already-chosen one — the spread
    * that makes Lloyd's converge to a balanced quantizer instead of
    * collapsing several seeds into one dense region (the failure mode
    * of uniform seeding that tanks IVF recall).
    */
  private def seedPlusPlus(sample: Array[Array[Double]], k: Int,
                           rnd: scala.util.Random): Array[Array[Double]] = {
    val n = sample.length
    val chosen = scala.collection.mutable.ArrayBuffer(
      sample(rnd.nextInt(n)).clone())
    val d2 = Array.fill(n)(Double.MaxValue)
    while (chosen.length < math.min(k, n)) {
      val last = chosen.last
      var total = 0.0
      var i = 0
      while (i < n) {
        val d = dist2(sample(i), last)
        if (d < d2(i)) d2(i) = d
        total += d2(i); i += 1
      }
      if (total == 0) chosen += sample(rnd.nextInt(n)).clone() // degenerate
      else {
        var target = rnd.nextDouble() * total
        var j = 0
        while (j < n - 1 && target > d2(j)) { target -= d2(j); j += 1 }
        chosen += sample(j).clone()
      }
    }
    chosen.toArray
  }

  /** Driver-side Lloyd's iterations over a bounded sample. The sample is
    * capped at `fitSample` regardless of corpus size (the FAISS recipe:
    * quantizer centroids converge on a few thousand points), so this is
    * O(restarts · sample · nlist · dim · iters) on the driver —
    * microseconds-to-milliseconds, with zero per-iteration cluster jobs.
    * Three kmeans++-seeded restarts, lowest inertia wins: seeding is
    * the dominant quality factor for a coarse quantizer, and restarts
    * cost nothing at this sample size.
    */
  private def lloyd(sample: Array[Array[Double]], k: Int, iters: Int,
                    seed: Long, restarts: Int = 3,
                    spherical: Boolean = true): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty quantizer sample")
    val dim = sample.head.length
    var best: Array[Array[Double]] = null
    var bestInertia = Double.MaxValue
    for (r <- 0 until restarts) {
      val rnd = new scala.util.Random(seed + r)
      val centroids = seedPlusPlus(sample, k, rnd)
      for (_ <- 0 until iters) {
        val sums = Array.fill(centroids.length)(new Array[Double](dim))
        val counts = new Array[Long](centroids.length)
        sample.foreach { v =>
          var bestC = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < centroids.length) {
            val d = dist2(v, centroids(c))
            if (d < bestD) { bestD = d; bestC = c }
            c += 1
          }
          counts(bestC) += 1
          var i = 0
          while (i < dim) { sums(bestC)(i) += v(i); i += 1 }
        }
        for (c <- centroids.indices if counts(c) > 0) {
          var i = 0
          while (i < dim) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
          // spherical update: the IVF quantizer lives on the unit sphere
          // (ivfIndex normalizes its inputs), so project the mean back —
          // assignment stays ≡ cosine assignment. PQ subspace codebooks
          // pass spherical=false: a SLICE of a unit vector is not unit,
          // plain L2 means are the correct update there
          if (spherical) {
            val n = math.sqrt(centroids(c).map(x => x * x).sum)
            if (n > 0) { i = 0; while (i < dim) { centroids(c)(i) /= n; i += 1 } }
          }
        }
      }
      val inertia = sample.map { v =>
        var m = Double.MaxValue; var c = 0
        while (c < centroids.length) {
          val d = dist2(v, centroids(c)); if (d < m) m = d; c += 1
        }
        m
      }.sum
      if (inertia < bestInertia) { bestInertia = inertia; best = centroids }
    }
    best
  }

  /** Squared-distance argmin over centroid literals — pure column
    * expressions, so cluster assignment of the full corpus stays inside
    * whole-stage codegen with no vector conversions.
    */
  def assignCluster(v: Column, centroids: Array[Array[Double]]): Column = {
    // argmin_c ‖v−c‖² = argmin_c (‖c‖² − 2·v·c): the ‖v‖² term is
    // constant per row and drops out, leaving one codegen'd dot per
    // centroid
    val dists = centroids.map { c =>
      val cc = c.map(x => x * x).sum
      lit(cc) - lit(2.0) * dot(v, typedLit(c.toSeq))
    }
    val distArr = array(dists.toIndexedSeq: _*)
    (array_position(distArr, array_min(distArr)) - 1).cast("int")
  }

  /** IVF index: (quantizer, corpus tagged with cluster id).
    *
    * The quantizer lives on the UNIT SPHERE (fit and assignment both
    * normalize first): the search metric is cosine, and raw-L2
    * clustering disagrees with it for unnormalized embeddings — a
    * cosine-near neighbor with a different magnitude lands in a far
    * cluster and recall quietly dies. On unit vectors L2² = 2 − 2·cos,
    * so sphere-L2 assignment ≡ cosine assignment, and the probe ranking
    * in [[ivfTopK]] (by cosine to the centroid) is consistent with it.
    * Scoring still uses the raw vectors (cosine is scale-invariant).
    */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
               nlist: Int, seed: Long = 42L, maxIter: Int = 8,
               fitSample: Int = 4096): (IvfModel, DataFrame) = {
    val sample = corpus.select(asDouble(col(vecCol)).as("v"))
      .limit(fitSample).collect()
      .map(_.getSeq[Double](0).toArray)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n > 0) v.map(_ / n) else v
      }
    val model = IvfModel(lloyd(sample, nlist, maxIter, seed))
    // cluster assignment costs nlist codegen'd dots per row — fan out
    val indexed = Layout.fanOut(corpus).select(col(idCol).as("vec_id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
      .withColumn("__vn",
        when(col("nv") > 0, transform(col("v"), _ / col("nv")))
          .otherwise(col("v")))
      .withColumn("cluster", assignCluster(col("__vn"), model.centroids))
      .drop("__vn")
    (model, indexed)
  }

  /** IVF search: score each query against the centroids, probe the
    * nprobe nearest clusters, then exact cosine within the probed subset.
    * The corpus join key is the cluster id — the scan prunes to
    * nprobe/nlist of the data instead of all of it.
    */
  def ivfTopK(indexed: DataFrame, model: IvfModel,
              queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nprobe: Int): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val centroids = model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("nq", norm(col("qv")))
    // nearest nprobe centroids per query: this window is bounded by
    // nlist × queries rows (both broadcast-small), not by the corpus —
    // the candidate-set funnel the TopKAgg finisher removes below
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").asc, col("cluster").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("nq"), col("cluster"))
    val scored = indexed.join(broadcast(probed), "cluster")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        when(col("nv") * col("nq") === 0, 0.0)
          .otherwise(dot(col("v"), col("qv")) / (col("nv") * col("nq"))))
    topKFinish(scored, "cos", k)
  }

  /** Engine-portable twin of [[ivfTopK]] — the coarse quantizer
    * becomes the md5-Rademacher sign-cone partition of
    * [[semDeDupPortable]] (cell = packed sign bits of v·plane), and
    * "nearest nprobe centroids" becomes the nprobe cells with the
    * smallest Hamming distance to the QUERY's own sign pattern (tie →
    * smaller cell id) — Hamming over hyperplane sign bits is monotone
    * in angular distance in expectation (Charikar 2002), the same
    * geometry argument IVF probing rests on. Every stage — cell bits,
    * probe ranking, the candidate equi-join, exact-cosine scoring,
    * (cos desc, id asc) ranking — replays in DuckDB, putting the IVF
    * candidate-pruning SHAPE on a hash-checked oracle; recall
    * properties of the production (KMeans) variant stay spec-gated on
    * [[ivfTopK]]. Scale shape is identical: probe table is
    * queries × 2^nPlanes (broadcast-small, window bounded by it),
    * corpus joins on the cell key, and the finisher is the bounded
    * mergeable [[topKFinish]].
    */
  def ivfTopKPortable(corpus: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      nPlanes: Int = 3, nprobe: Int = 3,
                      seed: Long = 42L): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= 16, "nPlanes must be in [1,16]")
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = projectionSigns(dim, nPlanes, seed)
    val nCells = 1 << nPlanes
    def cellOf(v: Column): Column = (0 until nPlanes).map { j =>
      when(dot(v, typedLit(planes(j).toSeq)) >= 0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _).cast("int")
    val c = Layout.fanOut(corpus)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
      .withColumn("cell", cellOf(col("v")))
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("nq", norm(col("qv")))
      .withColumn("qcell", cellOf(col("qv")))
    val cells = corpus.sparkSession.range(nCells)
      .select(col("id").cast("int").as("cell"))
    // bounded by queries × 2^nPlanes rows, both broadcast-small — the
    // same window-bound argument as ivfTopK's probe ranking
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ham").asc, col("cell").asc)
    val probed = q.crossJoin(broadcast(cells))
      .withColumn("ham", bit_count(col("qcell").bitwiseXOR(col("cell"))))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("nq"), col("cell"))
    val scored = c.join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        when(col("nv") * col("nq") === 0, 0.0)
          .otherwise(dot(col("v"), col("qv")) / (col("nv") * col("nq"))))
    topKFinish(scored, "cos", k)
  }

  // ---------- product quantization (PQ-ADC) ----------

  /** A trained product quantizer: per-subspace codebooks
    * ([m][ksub][dsub]).
    */
  case class PqModel(books: Array[Array[Array[Double]]]) {
    def m: Int = books.length
    def dsub: Int = books.head.head.length
  }

  /** Train a product quantizer (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): split the
    * unit-normalized vector into `m` contiguous subvectors and fit an
    * independent small k-means codebook in each subspace. Fit is
    * driver-side over a bounded sample (the same FAISS recipe and cap
    * as [[ivfIndex]] — codebooks converge on a few thousand points
    * regardless of corpus size). With m=8 × ksub=16, a 64-dim f32
    * embedding (256 B) compresses to 8 4-bit codes — the memory step
    * that makes billion-vector ANN fit in RAM. Subspace k-means runs
    * non-spherical: a slice of a unit vector is not unit.
    */
  def pqTrain(corpus: DataFrame, vecCol: String, m: Int = 8,
              ksub: Int = 16, seed: Long = 42L, maxIter: Int = 10,
              fitSample: Int = 4096): PqModel = {
    val sample = corpus.select(asDouble(col(vecCol)).as("v"))
      .limit(fitSample).collect()
      .map(_.getSeq[Double](0).toArray)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n > 0) v.map(_ / n) else v
      }
    require(sample.nonEmpty, "empty PQ fit sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    PqModel((0 until m).map { s =>
      val sub = sample.map(v =>
        java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloyd(sub, ksub, maxIter, seed + s, spherical = false)
    }.toArray)
  }

  /** Engine-portable PQ codebooks — the n02b/n06b recipe applied to
    * the codebook fit: entries are md5-derived ±1/√dim
    * (`"pq<seed>_<sub>_<code>_<t>"`, + when the first hex digit is
    * even), so ANY engine rebuilds the identical books and replays
    * encode (squared-distance argmin, first-code tie), ADC scoring,
    * shortlist and re-rank bit-for-bit. Deliberately NOT a trained
    * quantizer: recall belongs to [[pqTrain]]'s KMeans books
    * (spec-gated); this puts the PQ-ADC *pipeline* — the part with
    * machinery worth hash-checking — on the oracle. At dim = 64 the
    * entries are exactly ±0.125, so even the ‖c‖² constants are
    * dyadic-exact.
    */
  def pqBooksPortable(dim: Int, m: Int = 8, ksub: Int = 16,
                      seed: Long = 42L): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val scale = 1.0 / math.sqrt(dim.toDouble)
    val md = java.security.MessageDigest.getInstance("MD5")
    PqModel(Array.tabulate(m) { s =>
      Array.tabulate(ksub) { c =>
        Array.tabulate(dsub) { t =>
          val h = md.digest(s"pq${seed}_${s}_${c}_${t}".getBytes("UTF-8"))
          if (((h(0) >> 4) & 0xf) % 2 == 0) scale else -scale
        }
      }
    })
  }

  /** PQ-encode a corpus: per subspace, squared-distance argmin over
    * the codebook literals ([[assignCluster]] on the slice) — pure
    * codegen column math, the whole corpus encodes inside its scan.
    * Output: (vec_id, codes int array of length m).
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               model: PqModel): DataFrame = {
    val dsub = model.dsub
    df.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .withColumn("__vn",
        when(col("__n") > 0, transform(col("__v"), _ / col("__n")))
          .otherwise(col("__v")))
      .select(col("vec_id"),
        array((0 until model.m).map { s =>
          assignCluster(slice(col("__vn"), s * dsub + 1, dsub),
            model.books(s))
        }: _*).as("codes"))
  }

  /** PQ-ADC top-k with exact re-rank: every corpus code array scores
    * against the query via asymmetric distance (query stays
    * full-precision): Σ_s ‖q_s − C_s[code_s]‖², expanded to
    * ‖C‖² − 2·q_s·C so the per-query constant drops from the ranking.
    * A `shortlist` per query survives ADC; only those rows re-rank by
    * exact cosine on the raw vectors.
    *
    * Scale shape: the corpus-side scan touches ONLY the m-int code
    * column (the compressed index); raw vectors are fetched for
    * shortlist × queries rows via an equi-join on vec_id. That split —
    * approximate pass over codes, exact pass over a bounded candidate
    * set — is the production PQ search topology, and the reason the
    * index stays RAM-resident at corpus sizes where f32 vectors can't.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, model: PqModel, k: Int,
             shortlist: Int = 100): DataFrame = {
    val dsub = model.dsub
    val encoded = Layout.fanOut(pqEncode(corpus, idCol, vecCol, model))
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("nq", norm(col("qv")))
      .withColumn("qn",
        when(col("nq") > 0, transform(col("qv"), _ / col("nq")))
          .otherwise(col("qv")))
    val adcScore = (0 until model.m).map { s =>
      val codeS = element_at(col("codes"), s + 1)
      val cn2 = typedLit(model.books(s).map(c => c.map(x => x * x).sum).toSeq)
      val book = typedLit(model.books(s).map(_.toSeq).toSeq)
      element_at(cn2, codeS + 1) -
        lit(2.0) * dot(slice(col("qn"), s * dsub + 1, dsub),
          element_at(book, codeS + 1))
    }.reduce(_ + _)
    // ADC shortlist: smallest distances first — the same bounded
    // mergeable aggregate (largest = false), so the full corpus×queries
    // ADC score stream never funnels through per-query reducer tasks
    val short = encoded.crossJoin(broadcast(q.select(col("query_id"), col("qn"))))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", adcScore)
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("adc"), col("vec_id"),
        shortlist, largest = false).as("__sl"))
      .select(col("query_id"), explode(col("__sl.id")).as("vec_id"))
    val c = corpus.select(col(idCol).as("vec_id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
    val reranked = short.join(c, "vec_id")
      .join(q.select(col("query_id"), col("qv"), col("nq")), "query_id")
      .withColumn("cos",
        when(col("nv") * col("nq") === 0, 0.0)
          .otherwise(dot(col("v"), col("qv")) / (col("nv") * col("nq"))))
    topKFinish(reranked, "cos", k)
  }

  // ---------- random projection (Johnson–Lindenstrauss) ----------

  /** Deterministic Rademacher (±1) sign matrix for random projection,
    * shaped [outDim][dim]. Signs derive from md5 of a positional key
    * (`"rp<seed>_<i>_<j>"`, +1 when the first hex digit is even), not
    * from a JVM RNG, so ANY engine — including the DuckDB oracle — can
    * rebuild the exact matrix from the same recipe. Achlioptas (2003)
    * showed ±1 entries satisfy the JL lemma just like Gaussians, and
    * they keep the projection pure additions/subtractions.
    */
  def projectionSigns(dim: Int, outDim: Int,
                      seed: Long): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim) { j =>
      Array.tabulate(dim) { i =>
        val h = md.digest(s"rp${seed}_${i}_${j}".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** Random projection of an embedding column to `outDim` dimensions:
    * out_j = v · s_j / √outDim with the md5-derived ±1 matrix above.
    * The JL workhorse for 100-TB embedding pipelines — LSH/clustering
    * over 16 dims costs a quarter of 64, with pairwise distances
    * preserved within the JL distortion bound.
    *
    * Scale shape: the sign matrix enters the plan as `outDim` array
    * literals (dim-sized, bounded by embedding width — the SQ8 bounds
    * precedent), so the projection is `outDim` codegen'd
    * [[graft.functions.DotProduct]] loops inside the scan: row-local,
    * shuffle-free, and pushdown-transparent. The sequential fold makes
    * every output value engine-exact (list_dot_product parity), which
    * is what puts a dimensionality-reduction path on a hash-checked
    * oracle.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    outDim: Int, seed: Long = 42L): DataFrame = {
    require(outDim > 0, "outDim must be positive")
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val signs = projectionSigns(dim, outDim, seed)
    val scale = math.sqrt(outDim.toDouble)
    // cast the vector once, not once per output dimension — outDim
    // redundant array casts per row would be the hot-path cost at scale
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .select(col(idCol),
        array((0 until outDim).map { j =>
          (dot(col("__v"), typedLit(signs(j).toSeq)) / scale).as(s"p$j")
        }: _*).as("proj"))
  }

  /** Scale path for embedding near-dup: random-hyperplane LSH. Each
    * vector gets `numBits` sign bits (sign of v·rᵢ for seeded Gaussian
    * hyperplanes), packed to a long; bits split into `bands`; vectors
    * sharing any band bucket become candidates (equi-join on the band
    * key — shuffle ∝ data + collisions, never n²); candidates verify by
    * exact cosine. P[bit match] = 1 − θ/π, so near-dup pairs
    * (θ small) collide with high probability while the bulk never meets.
    */
  def cosineNearDupsLSH(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, numBits: Int = 16,
                        bands: Int = 4, seed: Long = 42L,
                        maxBucket: Int = 10000): DataFrame =
    cosineNearDupsLSHCached(corpus, idCol, vecCol, threshold, numBits,
      bands, seed, maxBucket).df

  def cosineNearDupsLSHCached(corpus: DataFrame, idCol: String,
                              vecCol: String, threshold: Double,
                              numBits: Int = 16, bands: Int = 4,
                              seed: Long = 42L,
                              maxBucket: Int = 10000): graft.ops.Cached = {
    require(numBits % bands == 0 && numBits <= 63, "bits must split into bands")
    val bitsPerBand = numBits / bands
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(numBits)(Seq.fill(dim)(rnd.nextGaussian()))

    val c = Layout.fanOut(corpus)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
      .withColumn("sig",
        planes.zipWithIndex.map { case (p, i) =>
          when(dot(col("v"), typedLit(p)) >= 0, lit(1L << i)).otherwise(0L)
        }.reduce(_ bitwiseOR _))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = c.select(col("id"), col("v"), col("nv"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), b * bitsPerBand)
              .bitwiseAND((1L << bitsPerBand) - 1).as("bucket"))
        }: _*)).as("bk"))
      .select(col("id"), col("v"), col("nv"), col("bk.band"), col("bk.bucket"))

    // zero vectors (and any dominant direction) pile into one sign
    // bucket per band — cap it before the self-join
    val (capped, hot) = Layout.capBucketsCached(banded,
      Seq("band", "bucket"), "id", maxBucket)
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.__salt") === col("b.__salt") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        when(col("a.nv") * col("b.nv") === 0, 0.0)
          .otherwise(dot(col("a.v"), col("b.v")) / (col("a.nv") * col("b.nv")))
          .as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
    graft.ops.Cached(pairs, Seq(c, hot))
  }

  /** Engine-portable twin of [[cosineNearDupsLSH]] — the d02b/d04b
    * verification pattern applied to embedding LSH. The seeded-Gaussian
    * hyperplanes (JVM RNG, not rebuildable elsewhere) are replaced by
    * the md5-derived ±1 planes of [[projectionSigns]]: sign-of-dot
    * against Rademacher directions is an equally valid cosine LSH
    * family (Charikar 2002 needs only symmetrically distributed
    * directions), and every stage — plane signs, signature bits, band
    * buckets, candidate join, exact-cosine verify — becomes
    * reconstructible by the DuckDB oracle from the same recipe. Dots
    * are sequential double folds (list_dot_product parity), so the
    * `>= 0` sign test and the final cosines are engine-identical.
    *
    * Scale shape is the production path's: signatures are scan-local
    * column math, candidates come from a banded equi-join (shuffle ∝
    * data + collisions, never n²). The salt cap is omitted — this is
    * the verification twin; capped-bucket semantics are spec'd on the
    * production variant.
    */
  def cosineNearDupsLSHPortable(corpus: DataFrame, idCol: String,
                                vecCol: String, threshold: Double,
                                numBits: Int = 16, bands: Int = 4,
                                seed: Long = 42L): DataFrame = {
    require(numBits % bands == 0 && numBits <= 62, "bits must split into bands")
    val bitsPerBand = numBits / bands
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = projectionSigns(dim, numBits, seed)
    val c = Layout.fanOut(corpus)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
      .withColumn("bits", array((0 until numBits).map { j =>
        when(dot(col("v"), typedLit(planes(j).toSeq)) >= 0, 1L).otherwise(0L)
      }: _*))
    val banded = c.select(col("id"), col("v"), col("nv"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            (0 until bitsPerBand).map { o =>
              element_at(col("bits"), b * bitsPerBand + o + 1) * (1L << o)
            }.reduce(_ + _).as("bucket"))
        }: _*)).as("bk"))
      .select(col("id"), col("v"), col("nv"), col("bk.band"), col("bk.bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        when(col("a.nv") * col("b.nv") === 0, 0.0)
          .otherwise(dot(col("a.v"), col("b.v")) / (col("a.nv") * col("b.nv")))
          .as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, public): semantic deduplication.
    * Embeddings cluster under the IVF coarse quantizer, so candidate
    * comparison happens WITHIN clusters only — the global n² never
    * materializes and the shuffle key is the cluster id. Within-cluster
    * pairs with cosine ≥ `threshold` form duplicate groups (connected
    * components, O(log d) pointer-doubling rounds), and each group keeps
    * exactly one member — per the paper's rule, the example with the
    * LOWEST cosine to its cluster centroid (the least prototypical, so
    * the diversity tail survives; ties break to the smallest id).
    * Degenerate clusters (zero vectors, templated embeddings) are
    * salt-capped by [[Layout.capBuckets]] before the self-join, the same
    * giant-bucket guard the LSH paths use: pair count is O(n·maxCluster)
    * worst-case, never quadratic in a hot cluster. Survivors keep their
    * `cluster` and `cent_cos` columns for downstream diversity analysis.
    */
  def semDeDup(corpus: DataFrame, idCol: String, vecCol: String,
               nlist: Int, threshold: Double, seed: Long = 42L,
               maxCluster: Int = 10000): DataFrame =
    semDeDupCached(corpus, idCol, vecCol, nlist, threshold, seed,
      maxCluster).df

  def semDeDupCached(corpus: DataFrame, idCol: String, vecCol: String,
                     nlist: Int, threshold: Double, seed: Long = 42L,
                     maxCluster: Int = 10000): graft.ops.Cached = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (model, indexedRaw) = ivfIndex(corpus, idCol, vecCol, nlist, seed)
    val indexed = indexedRaw
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // centroids are unit-norm (spherical quantizer) → cos(v, c) = v·c/‖v‖
    val centDf = model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cluster", "centroid")
    val withCent = indexed.join(broadcast(centDf), "cluster")
      .withColumn("cent_cos",
        when(col("nv") === 0, 0.0)
          .otherwise(dot(col("v"), col("centroid")) / col("nv")))
      .select("vec_id", "cluster", "v", "nv", "cent_cos")
    val (capped, hot) = Layout.capBucketsCached(withCent, Seq("cluster"),
      "vec_id", maxCluster)
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.__salt") === col("b.__salt") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        when(col("a.nv") * col("b.nv") === 0, 0.0)
          .otherwise(dot(col("a.v"), col("b.v")) / (col("a.nv") * col("b.nv")))
          .as("cos"))
      .filter(col("cos") >= threshold)
    val labels = Dedup.connectedComponents(pairs)
    // opt-in skew diagnostics (spark.graft.diagnostics=true): giant
    // duplicate groups and hot clusters surface in the log before they
    // concentrate a reducer — the pre-retry signal a production
    // semantic-dedup run wants
    if (graft.ops.Diag.enabled(spark))
      graft.ops.Diag.logTop("semdedup",
        graft.ops.Diag.componentSkew(labels).unionByName(
          graft.ops.Diag.bucketSkew(withCent, Seq("cluster"),
            minSize = math.max(1L, maxCluster.toLong / 2))))
    // one survivor per duplicate group: lexicographic min over
    // (cent_cos, id) — an aggregation, NOT a window, so the huge
    // "no component" population never funnels through one partition
    val keep = labels.withColumnRenamed("id", "vec_id")
      .join(withCent.select("vec_id", "cent_cos"), "vec_id")
      .groupBy(col("component"))
      .agg(min(struct(col("cent_cos"), col("vec_id"))).as("k"))
      .select(col("k.vec_id").as("vec_id"), lit(1).as("__keep"))
    val grouped = labels.select(col("id").as("vec_id"),
      lit(1).as("__grouped"))
    val survivors = withCent.select("vec_id", "cluster", "cent_cos")
      .join(grouped, Seq("vec_id"), "left")
      .join(keep, Seq("vec_id"), "left")
      .filter(col("__grouped").isNull || col("__keep").isNotNull)
      .select("vec_id", "cluster", "cent_cos")
    graft.ops.Cached(survivors, Seq(indexed, hot))
  }

  /** Engine-portable twin of [[semDeDup]] — the n04b trick applied to
    * the cluster step. The KMeans coarse quantizer (JVM RNG + iterative
    * fits, not rebuildable elsewhere) is replaced by md5-seeded
    * Rademacher sign bucketing: `nPlanes` ±1 hyperplanes from
    * [[projectionSigns]] partition the sphere into `2^nPlanes` cones
    * (cluster = packed sign bits of v·plane — the hyperplane-LSH cell,
    * an equally valid locality-preserving coarse quantizer), and the
    * paper's centroid-prototypicality score becomes the cosine to a
    * fixed md5-derived ±1 prototype direction per cluster
    * (`projectionSigns(dim, 2^nPlanes, seed + 5000)`). Every stage —
    * cluster bits, prototype cosines, within-cluster pairs, connected
    * components, the keep-least-prototypical rule with (score, id)
    * tie-break — replays in the DuckDB oracle via sequential-fold dots
    * (`list_dot_product` parity). Same scale shape as the production
    * variant: candidates come from an equi-join on the cluster key,
    * components are the pointer-doubling rounds, survivors resolve by
    * aggregation (no global window). The hot-cluster salt cap is
    * omitted — this is the verification twin; capped semantics are
    * spec'd on [[semDeDup]].
    */
  def semDeDupPortable(corpus: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, nPlanes: Int = 3,
                       seed: Long = 42L): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= 16, "nPlanes must be in [1,16]")
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = projectionSigns(dim, nPlanes, seed)
    val nClusters = 1 << nPlanes
    val protos = projectionSigns(dim, nClusters, seed + 5000)
    val rootDim = math.sqrt(dim.toDouble)
    val withCent = corpus
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
      .withColumn("cluster",
        (0 until nPlanes).map { j =>
          when(dot(col("v"), typedLit(planes(j).toSeq)) >= 0,
            lit(1 << j)).otherwise(lit(0))
        }.reduce(_ + _).cast("int"))
      .withColumn("cent_cos",
        when(col("nv") === 0, 0.0).otherwise(
          element_at(array((0 until nClusters).map(ci =>
            dot(col("v"), typedLit(protos(ci).toSeq))): _*),
            col("cluster") + 1) / (col("nv") * lit(rootDim))))
    val pairs = withCent.as("a").join(withCent.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        when(col("a.nv") * col("b.nv") === 0, 0.0)
          .otherwise(dot(col("a.v"), col("b.v")) /
            (col("a.nv") * col("b.nv")))
          .as("cos"))
      .filter(col("cos") >= threshold)
    val labels = Dedup.connectedComponents(pairs)
    val keep = labels.withColumnRenamed("id", "vec_id")
      .join(withCent.select("vec_id", "cent_cos"), "vec_id")
      .groupBy(col("component"))
      .agg(min(struct(col("cent_cos"), col("vec_id"))).as("k"))
      .select(col("k.vec_id").as("vec_id"), lit(1).as("__keep"))
    val grouped = labels.select(col("id").as("vec_id"),
      lit(1).as("__grouped"))
    withCent.select("vec_id", "cluster", "cent_cos")
      .join(grouped, Seq("vec_id"), "left")
      .join(keep, Seq("vec_id"), "left")
      .filter(col("__grouped").isNull || col("__keep").isNotNull)
      .select("vec_id", "cluster", "cent_cos")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold — the exact
    * all-pairs baseline [[cosineNearDupsLSH]] approximates. The O(n²)
    * self-join is fenced by `maxRows` (refuses unbounded input instead
    * of silently going quadratic); the 100 TB path is the LSH variant or
    * `ivfIndex` + within-cluster compare.
    */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, maxRows: Long = 100000L): DataFrame = {
    val rows = corpus.count()
    require(rows <= maxRows,
      s"cosineNearDups is the exact all-pairs baseline: got $rows rows " +
        s"(max $maxRows); use cosineNearDupsLSH for corpus-scale input " +
        "or raise maxRows explicitly")
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
    c.as("a").join(c.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        when(col("a.nv") * col("b.nv") === 0, 0.0)
          .otherwise(dot(col("a.v"), col("b.v")) / (col("a.nv") * col("b.nv")))
          .as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** MAXIMAL MARGINAL RELEVANCE reranking (Carbonell & Goldstein,
    * SIGIR 1998): greedily pick `k` results from the relevance
    * shortlist, each step maximizing `λ·rel(d) − (1−λ)·max_{s∈S}
    * sim(d, s)` — the diversity-aware rerank that keeps a RAG context
    * window from filling with five near-copies of the same passage.
    *
    * Determinism/parity: relevance and pairwise similarity are the
    * same raw-double cosine the n01 oracle already proves
    * engine-exact (identical IEEE operation order on both sides), the
    * λ mix uses the literal `(1 − λ)` double both engines compute
    * identically, and every argmax tie-breaks to the lowest id — so
    * all `k` greedy steps replay in unrolled SQL with no rounding.
    *
    * Scale shape: ONE broadcast-NL scan of the corpus builds the
    * shortlist (the [[bruteForceTopK]] cost); everything after runs on
    * `shortlistK²` pairwise sims and ≤ k-row selected frames
    * (materialized via [[Layout.materializeBounded]] each step, so
    * greedy iteration i never re-derives steps 1..i−1).
    *
    * Output: (pick 1..k, vec_id, rel, max_sim — null on the first
    * pick, mmr).
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, shortlistK: Int = 20, k: Int = 5,
                lam: Double = 0.7): DataFrame = {
    require(k >= 1 && shortlistK >= k, "need shortlistK >= k >= 1")
    val mu = 1 - lam
    val qProj = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("nq", norm(col("qv")))
    // one global greedy set is only meaningful for ONE query vector —
    // with several, shortlist and picks would silently interleave. ONE
    // bounded (≤ 2 row) collect both validates the contract and pins
    // the query as a LocalRelation, so the broadcast below never
    // rescans the caller's frame — no separate count() job.
    val qRows = qProj.limit(2).collect()
    require(qRows.length == 1,
      s"mmrRerank expects exactly one query row, saw ${qRows.length}" +
        (if (qRows.length == 2) "+" else ""))
    val q = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qProj.schema)
    val c = corpus.select(col(idCol).as("vec_id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
    val shortlist = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rel",
        when(col("nv") * col("nq") === 0, 0.0)
          .otherwise(dot(col("v"), col("qv")) / (col("nv") * col("nq"))))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(shortlistK)
      .select(col("vec_id"), col("v"), col("nv"), col("rel"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sims = shortlist.as("a").join(shortlist.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        when(col("a.nv") * col("b.nv") === 0, 0.0)
          .otherwise(dot(col("a.v"), col("b.v")) /
            (col("a.nv") * col("b.nv"))).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var selected = Layout.materializeBounded(
      shortlist.orderBy(col("rel").desc, col("vec_id")).limit(1)
        .select(lit(1).as("pick"), col("vec_id"), col("rel"),
          lit(null).cast("double").as("max_sim"),
          round(col("rel"), 7).as("mmr")),
      maxRows = k.toLong)
    for (i <- 2 to k) {
      val ms = sims
        .join(selected.select(col("vec_id").as("ib")), Seq("ib"),
          "left_semi")
        .groupBy(col("ia").as("vec_id"))
        .agg(max(col("sim")).as("max_sim"))
      val chosen = shortlist
        .join(selected.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .join(ms, Seq("vec_id"))
        // 7dp-rounded before the argmax: the λ-mix is the one spot
        // where engine product/subtract order drifted a final ulp
        .withColumn("mmr",
          round(lit(lam) * col("rel") - lit(mu) * col("max_sim"), 7))
        // argmax with lowest-id tie-break via min_by over (−mmr, id):
        // negating the DOUBLE score (not the id) keeps the tie-break
        // valid for ANY orderable id type — unary minus on a string id
        // would yield null (nondeterministic ties) or fail under ANSI
        .agg(min_by(
          struct(col("vec_id"), col("rel"), col("max_sim"), col("mmr")),
          struct((-col("mmr")).as("__negmmr"), col("vec_id"))).as("__w"))
        .select(lit(i).as("pick"), col("__w.vec_id").as("vec_id"),
          col("__w.rel").as("rel"), col("__w.max_sim").as("max_sim"),
          col("__w.mmr").as("mmr"))
        // a drained candidate pool yields a null max_by row — drop it
        // so a short shortlist returns FEWER picks (like the oracle's
        // empty step CTEs), never phantom null ids
        .filter(col("vec_id").isNotNull)
      selected = Layout.materializeBounded(
        selected.unionByName(chosen), maxRows = k.toLong)
    }
    // the greedy loop is EAGER (each step materializes ≤ k rows to a
    // LocalRelation), so by now shortlist/sims have served every read
    // they will ever get — unpersist here instead of leaking them to
    // the harness's clearCache (the Cached-handle convention is for
    // LAZY results; an eager op can just clean up after itself)
    shortlist.unpersist(blocking = false)
    sims.unpersist(blocking = false)
    selected
  }

  /** Engine-portable IVF candidate kNN by L2 — [[ivfTopKPortable]]'s
    * cell machinery (md5-Rademacher sign-cone cells, Hamming-nearest
    * nprobe probing) finished with [[bruteForceTopKL2]]'s exact
    * −‖v−q‖² scoring instead of cosine. This is the 100-TB kNN stage
    * for the metric consumers ([[lofFromKnn]], [[knnVoteFromKnn]]):
    * the corpus joins on the cell key (scan prunes to ~nprobe/2^nPlanes
    * of the data), the finisher is the bounded mergeable top-k, and
    * every stage replays in DuckDB — same hash-oracle status as n02b.
    * With `nprobe = 1 << nPlanes` every cell is probed and the result
    * is EXACTLY [[bruteForceTopKL2]] (the LofSpec recall-1.0 gate).
    * Output: (query_id, vec_id, negl2, rank).
    */
  def ivfTopKL2Portable(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        nPlanes: Int = 3, nprobe: Int = 3,
                        seed: Long = 42L): DataFrame = {
    // ≤ 12 (not the cosine variant's 16): the per-(qcell, cell) probe
    // table below is 4^nPlanes rows — 16.8M at 12 (fine through one
    // window), 4.3G at 16 (not a "bounded" table by any argument).
    // 2^12 cells at ~150 points/cell already serves a ~600k-point
    // candidate set; corpus-scale deployments shard above that.
    require(nPlanes >= 1 && nPlanes <= 12, "nPlanes must be in [1,12]")
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = projectionSigns(dim, nPlanes, seed)
    val nCells = 1 << nPlanes
    def cellOf(v: Column): Column = (0 until nPlanes).map { j =>
      when(dot(v, typedLit(planes(j).toSeq)) >= 0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _).cast("int")
    val c = Layout.fanOut(corpus)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv2", dot(col("v"), col("v")))
      .withColumn("cell", cellOf(col("v")))
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("nq2", dot(col("qv"), col("qv")))
      .withColumn("qcell", cellOf(col("qv")))
    val spark = corpus.sparkSession
    val cells = spark.range(nCells)
      .select(col("id").cast("int").as("cell"))
    // Hamming probe ranking depends only on the QUERY'S CELL, not the
    // query — so rank once per (qcell, cell) pair: a 4^nPlanes-row
    // table (bounded by the plane budget; the nPlanes ≤ 16 require
    // above caps it, and practical self-kNN sizes cells ∝ corpus/150
    // so this stays ≪ corpus). The r10 probe measured the per-QUERY
    // form (q × cells through a window, each row dragging the 64-dim
    // vector) going quadratic at 50× — 51M heavy rows through one
    // shuffle; this form is n-independent. Selection is identical:
    // row_number over (ham asc, cell asc) per qcell ≡ per query.
    val probeW = Window.partitionBy(col("qcell"))
      .orderBy(col("ham").asc, col("cell").asc)
    val cellProbes = spark.range(nCells)
      .select(col("id").cast("int").as("qcell"))
      .crossJoin(broadcast(cells))
      .withColumn("ham", bit_count(col("qcell").bitwiseXOR(col("cell"))))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("qcell"), col("cell"))
    // no broadcast hint on probed: unlike the cosine variant (n01
    // contract — bounded query set), the metric consumers run this
    // SELF-kNN with queries = corpus, so probed is n·nprobe rows. AQE
    // broadcasts it at audit sizes and keeps the cell equi-join
    // shuffled-hash at corpus scale; a forced broadcast here would be
    // the 8 GB wall the lofFromKnn factoring exists to avoid.
    val probed = q.join(broadcast(cellProbes), "qcell")
      .select(col("query_id"), col("qv"), col("nq2"), col("cell"))
    val scored = c.join(probed, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("negl2",
        -(col("nv2") + col("nq2") - lit(2.0) * dot(col("v"), col("qv"))))
    topKFinish(scored, "negl2", k)
  }

  /** Brute-force NEAREST-by-L2 top-k, the metric twin of
    * [[bruteForceTopK]]: score = −‖v−q‖² expanded to
    * −(v·v + q·q − 2 v·q) with the self-dots computed once per
    * row/query, so the shared (score desc, id asc) top-k finisher
    * means nearest-first. The expansion's expression tree is fixed so
    * an oracle computing the same three dot products reproduces the
    * double bit-for-bit.
    */
  def bruteForceTopKL2(corpus: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = Layout.fanOut(corpus).select(col(idCol).as("vec_id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nv2", dot(col("v"), col("v")))
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("nq2", dot(col("qv"), col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("negl2",
        -(col("nv2") + col("nq2") - lit(2.0) * dot(col("v"), col("qv"))))
    topKFinish(scored, "negl2", k)
  }

  /** LOCAL OUTLIER FACTOR (Breunig et al., SIGMOD 2000) over an
    * embedding column: per point, LOF = mean over its k nearest
    * neighbors of lrd(o)/lrd(p), where lrd = k / Σ reach-dist and
    * reach-dist(p,o) = max(k-distance(o), d(p,o)) — the density-ratio
    * outlier score the fraud literature reaches for when a global
    * threshold (w08's z-scores) misses locally-sparse regions.
    *
    * Exactness: kNN reuses [[bruteForceTopKL2]]'s raw-double distance
    * ordering (negl2 desc, id asc — the n01-proven parity axis);
    * reach distances are round(·,7)→DECIMAL before the per-point sum
    * (order-free), lrd/LOF ratios are 7dp fixed-order doubles summed
    * in DECIMAL. Division guards satisfy ANSI (coincident-point
    * degeneracy yields null lrd, not an error).
    *
    * Scale shape: exact LOF is O(n²) — `points` must be a bounded
    * candidate set (the n01 contract: the query side broadcasts). The
    * 100-TB path is [[lofFromKnn]]: swap the kNN stage for the
    * IVF-bucketed candidate frame ([[ivfTopKL2Portable]], n16b) — the
    * reach/lrd/ratio algebra consumes any (p, o, d2) neighbor frame
    * unchanged.
    *
    * Output per point: `vec_id`, `kdist`, `lrd`, `lof` (7dp).
    */
  def lofOutliers(points: DataFrame, idCol: String, vecCol: String,
                  k: Int): DataFrame =
    lofFromKnn(bruteForceTopKL2(points, points, idCol, vecCol, k)
      .select(col("query_id").as("p"), col("vec_id").as("o"),
        (-col("negl2")).as("d2")), k)

  /** [[lofOutliers]]'s reach/lrd/ratio algebra factored over ANY
    * precomputed kNN frame — the r9-verdict mandate that turns the
    * "100-TB path" from documentation into an API. `knn` carries one
    * row per (point p, neighbor o) with `d2` = squared L2 distance,
    * exactly k neighbors per point (the top-k contract); the algebra
    * computes k-distance, reach-distance, lrd, and the LOF ratio from
    * that frame alone — no access to the vectors.
    *
    * Contract: LOF is defined over ONE point set, so every id
    * appearing as a neighbor `o` must also appear as a query `p`
    * (self-kNN shape); a neighbor with no own k-distance would
    * silently shrink its reach sum through the inner join. When the
    * frame comes from an ANN index ([[ivfTopKL2Portable]]), the
    * k-distances are the index's approximate ones — the standard
    * approximate-LOF semantics; at `nprobe = 2^nPlanes` (recall 1.0)
    * the result is bit-equal to [[lofOutliers]] (LofSpec gate).
    *
    * Scale shape: three self-joins on point ids (broadcast when the
    * per-point aggregates are bounded; hash otherwise) over a frame of
    * n·k rows — linear in the corpus once the kNN stage is sublinear,
    * which is what kills the exact form's n² term (SCALEPROBE §r10).
    */
  def lofFromKnn(knn: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the per-point aggregate frames (kd, sums) are O(n) rows — no
    // broadcast hints: AQE converts these equi-joins to broadcast at
    // audit sizes and keeps them shuffled-hash at corpus scale (a
    // forced broadcast here would be the 8 GB wall at 100 TB)
    val kd = knn.groupBy(col("p").as("kp")).agg(max(col("d2")).as("kd2"))
    val reach = knn.join(kd, col("o") === col("kp"))
      .withColumn("reach",
        round(sqrt(greatest(col("kd2"), col("d2"))), 7)
          .cast("decimal(27,7)"))
    val sums = reach.groupBy(col("p")).agg(sum(col("reach")).as("rsum"))
    val ratio = knn
      .join(sums.select(col("p").as("sp"),
        col("rsum").as("sum_p")), col("p") === col("sp"))
      .join(sums.select(col("p").as("so"),
        col("rsum").as("sum_o")), col("o") === col("so"))
      .withColumn("r",
        when(col("sum_o").cast("double") > 0,
          round(col("sum_p").cast("double") /
            col("sum_o").cast("double"), 7))
          .cast("decimal(27,7)"))
    val lof = ratio.groupBy(col("p")).agg(sum(col("r")).as("sum_r"))
    lof.join(kd, col("p") === col("kp"))
      .join(sums.select(col("p").as("sq"),
        col("rsum").as("rsum")), col("p") === col("sq"))
      .select(col("p").as("vec_id"),
        round(sqrt(col("kd2")), 7).as("kdist"),
        when(col("rsum").cast("double") > 0,
          round(lit(k.toDouble) / col("rsum").cast("double"), 7))
          .as("lrd"),
        round(col("sum_r").cast("double") / lit(k.toDouble), 7)
          .as("lof"))
  }

  /** DBSCAN density clustering (Ester et al., KDD 1996) over an
    * embedding column — the cluster notion that finds arbitrarily-
    * shaped dense regions and calls sparse points NOISE, where k-means
    * (m20) forces every point into a sphere: core points have at least
    * `minPts` points (self included) within √eps2, clusters are the
    * connected components of the core-core neighbor graph, border
    * points attach to a core neighbor, everything else is noise
    * (cluster = null).
    *
    * Decomposition — every stage an existing oracle-proven primitive:
    * the eps-neighbor pairs are the [[bruteForceTopKL2]] distance
    * expansion with a threshold instead of a top-k (the n03
    * bounded-subset contract: the point set broadcasts, so this exact
    * form is for bounded candidate sets; the scale path generates the
    * pair frame with the banded machinery — [[cosineNearDupsLSH]] /
    * [[ivfTopKL2Portable]] cells — exactly like n16b swaps the kNN
    * stage); components run [[graft.ops.Graph.connectedComponentsCached]]
    * (pointer jumping — `rounds` ≥ log₂ of the core-graph diameter for
    * full convergence, the g11 contract, and the oracle replays the
    * SAME fixed rounds so parity holds regardless); border assignment
    * is one min-label join. `eps2` is the SQUARED radius and compares
    * raw-double d2 ≤ literal — no sqrt, no rounding boundary anywhere.
    * Cluster ids are the min core id of each component (deterministic;
    * borders take the min over their core neighbors' labels).
    *
    * Output per input point: (vec_id, n_nb, is_core, cluster) —
    * n_nb = eps-neighbors excluding self, cluster null ⟺ noise.
    */
  def dbscanCached(points: DataFrame, idCol: String, vecCol: String,
                   eps2: Double, minPts: Int,
                   rounds: Int = 3): graft.ops.Cached = {
    require(eps2 > 0, s"eps2 must be positive, got $eps2")
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pts = Layout.fanOut(points)
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv2", dot(col("v"), col("v")))
      .persist(disk)
    val q = pts.select(col("vec_id").as("p"), col("v").as("vp"),
      col("nv2").as("np2"))
    val nbrs = pts.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("p"))
      .withColumn("d2",
        col("nv2") + col("np2") - lit(2.0) * dot(col("v"), col("vp")))
      .filter(col("d2") <= lit(eps2))
      .select(col("p"), col("vec_id").as("o"))
    val inner = dbscanFromPairs(nbrs, pts.select(col("vec_id")),
      minPts, rounds)
    graft.ops.Cached(inner.df, pts +: inner.backing)
  }

  /** [[dbscanCached]]'s core/component/border algebra factored over
    * ANY precomputed eps-neighbor pair frame (the [[lofFromKnn]]
    * companion): `nbrs` carries one DIRECTED row per ordered
    * (p, o) pair within eps — from the exact bounded-subset scan, the
    * banded LSH/IVF candidate frames, or an external radius index —
    * and `allPoints` the full point-id universe (isolated points have
    * no pair row but still need a noise verdict). Everything past the
    * pair stage — degree, core rule, pointer-jumping components,
    * border min-label, noise — runs from those two frames alone, no
    * access to the vectors. When the pair frame comes from an
    * approximate index the semantics are approximate-DBSCAN (recall
    * misses can demote cores or split clusters — the standard
    * trade); with the exact pair frame this IS [[dbscanCached]]
    * (LofSpec gate).
    */
  def dbscanFromPairs(nbrs: DataFrame, allPoints: DataFrame,
                      minPts: Int, rounds: Int = 3): graft.ops.Cached = {
    require(minPts >= 2, s"minPts must be >= 2, got $minPts")
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // nbrs feeds deg, the core-core edge join, and border assignment
    val pairs = nbrs.select(col("p"), col("o")).persist(disk)
    val deg = pairs.groupBy(col("p")).agg(count(lit(1)).as("n_nb"))
      .persist(disk)
    val core = deg.filter(col("n_nb") >= minPts - 1)
      .select(col("p").as("node"))
    val coreEdges = pairs
      .join(core.select(col("node").as("p")), Seq("p"))
      .join(core.select(col("node").as("o")), Seq("o"))
      .select(col("p").as("u"), col("o").as("v"))
    val comp = graft.ops.Graph.connectedComponentsCached(coreEdges, rounds)
    // a core point with only border neighbors has no core edge and is
    // absent from comp — it seeds its own cluster (coalesce to self)
    val coreLbl = core.join(comp.df, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("lbl"))
      .persist(disk)
    val borderLbl = pairs
      .join(coreLbl.select(col("node").as("o"), col("lbl")), Seq("o"))
      .groupBy(col("p")).agg(min(col("lbl")).as("blbl"))
    val out = allPoints.select(allPoints.columns.head)
      .toDF("vec_id")
      .join(deg.select(col("p").as("vec_id"), col("n_nb")),
        Seq("vec_id"), "left")
      .join(coreLbl.select(col("node").as("vec_id"),
        col("lbl").as("clbl")), Seq("vec_id"), "left")
      .join(borderLbl.select(col("p").as("vec_id"), col("blbl")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_nb"), lit(0L)).as("n_nb"),
        col("clbl").isNotNull.as("is_core"),
        coalesce(col("clbl"), col("blbl")).as("cluster"))
    graft.ops.Cached(out,
      Seq(pairs, deg, coreLbl) ++ comp.backing)
  }

  /** k-NEAREST-NEIGHBOR majority-vote classification over an embedding
    * column — the zero-training baseline every embedding-quality audit
    * starts from ("do the learned vectors separate the classes"), and
    * the label-transfer step of weak supervision (label the unlabeled
    * split from its nearest labeled neighbors). The kNN stage reuses
    * [[bruteForceTopKL2]]'s literal ordering (negl2 desc, id asc — the
    * n01-proven parity axis); the vote is a per-(query, label) count
    * with ties to the SMALLEST label (the [[labelSpreadCached]] argmax
    * convention), all integers — no float boundary anywhere past the
    * distance ordering itself.
    *
    * Scale shape: the query side broadcasts (the n01 contract — bounded
    * query set); the 100-TB path is [[knnVoteFromKnn]] — swap the kNN
    * stage for the IVF candidate frame ([[ivfTopKL2Portable]], n17b),
    * the vote algebra consumes any (query_id, vec_id) neighbor frame
    * unchanged via the labeled corpus join.
    *
    * Output per query: (query_id, true_label, pred_label, votes) —
    * `votes` = the winning label's neighbor count, `true_label` = the
    * query row's own label when `queries` carries `labelCol` (audit
    * column; the classification error rate is one avg away).
    */
  def knnVote(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    knnVoteFromKnn(bruteForceTopKL2(corpus, queries, idCol, vecCol, k),
      corpus, queries, idCol, labelCol)
  }

  /** [[knnVote]]'s vote algebra factored over ANY precomputed neighbor
    * frame (the [[lofFromKnn]] companion): `knn` carries one row per
    * (query_id, vec_id) neighbor pair — from [[bruteForceTopKL2]],
    * [[ivfTopKL2Portable]], or any external index dump. The vote joins
    * the labeled corpus on the neighbor id, counts per (query, label),
    * and takes one mergeable max_by argmax (ties to the smallest
    * label) — no window, no access to the vectors. Scale shape: two
    * hash aggregations + two equi-joins over n·k rows — linear once
    * the kNN stage is sublinear.
    */
  def knnVoteFromKnn(knn: DataFrame, corpus: DataFrame,
                     queries: DataFrame, idCol: String,
                     labelCol: String): DataFrame = {
    val voted = knn.select(col("query_id"), col("vec_id"))
      .join(corpus.select(col(idCol).as("vec_id"),
        col(labelCol).as("__nl")), Seq("vec_id"))
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__votes"))
      // per-query argmax, ties to the smallest label: one mergeable
      // max_by on the (votes, -label) ordering pair — no window
      .groupBy(col("query_id"))
      .agg(max(struct(col("__votes"),
        (-col("__nl")).as("__negl"), col("__nl").as("lbl"))).as("__w"))
      .select(col("query_id"), col("__w.lbl").as("pred_label"),
        col("__w.__votes").as("votes"))
    voted.join(queries.select(col(idCol).as("query_id"),
        col(labelCol).as("true_label")), Seq("query_id"))
      .select(col("query_id"), col("true_label"), col("pred_label"),
        col("votes"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of
    * N ranked retrieval runs: score(q,d) = Σ_runs 1/(k0 + rank). The
    * standard hybrid-retrieval merge (BM25 ⊕ ANN) — rank-based, so
    * incomparable score scales fuse without calibration. `runs` is the
    * UNION of the per-run (query, id, rank) triples; contributions are
    * round(·,9)→DECIMAL so the per-(query,id) sum is order-independent
    * and engine-exact (the t22 discipline), and the per-query top-k
    * runs on the bounded mergeable [[graft.functions.TopKAgg]] heap.
    * Output: (query_id, vec_id, rrf, rank), rank 1..topK by
    * (rrf desc, id asc).
    */
  def rrfFuse(runs: DataFrame, qCol: String, idCol: String,
              rankCol: String, k0: Int = 60, topK: Int = 10): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    val contrib = runs.select(col(qCol).as("query_id"),
      col(idCol).as("vec_id"),
      round(lit(1.0) / (lit(k0) + col(rankCol)), 9)
        .cast("decimal(18,9)").as("__c"))
    val fused = contrib.groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("__c")).cast("double").as("rrf"))
    topKFinish(fused, "rrf", topK)
  }

  /** Greedy k-CENTER CORESET (farthest-point traversal, the 2-approx
    * of Gonzalez 1985): seed at the lowest id, then k−1 times pick the
    * point FARTHEST (squared L2) from its nearest already-chosen
    * center — the diverse-subset selection a training-data pipeline
    * runs to cover an embedding space with a small budget (the
    * coverage-first complement of [[mmrRerank]]'s relevance-first
    * greedy). Returns (pick 1..k, id, d2) with d2 = the squared
    * distance that won the pick (NULL for the seed), rounded to 9dp
    * for output only — the argmax itself runs on the raw doubles,
    * whose expression tree (v·v + c·c − 2 v·c, min over centers) an
    * oracle reproduces bit-for-bit.
    *
    * Scale shape: INCREMENTAL running-min state. A persisted
    * (vec_id, v, nv2, md) frame carries each point's distance to its
    * nearest chosen center; every step joins it against ONLY the
    * NEWEST center (one broadcast row), folds `least(md, d_new)`, and
    * takes a single min_by argmax (ties to the lowest id; the ordering
    * struct negates only the DOUBLE distance, so ids keep their caller
    * type). Total work is O(n·k) dot products — the classic
    * farthest-point form — not the O(n·k²) of rejoining all chosen
    * centers each pass; lineage is cut every `checkpointEvery` picks
    * ([[Checkpoints.cut]]) so pass i never re-derives passes 1..i−1.
    * Parity is untouched: min over a set of fixed-order doubles ≡ the
    * running `least` of the same doubles, bit for bit. Nothing
    * corpus-sized ever reaches the driver; each step collects exactly
    * one row (inherent to greedy k-center).
    */
  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, checkpointEvery: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val spark = df.sparkSession
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cand = Layout.fanOut(df)
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv2", dot(col("v"), col("v")))
      .persist(disk)
    val idField = cand.schema("vec_id")
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pick",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      idField.copy(name = "vec_id"),
      org.apache.spark.sql.types.StructField("d2",
        org.apache.spark.sql.types.DoubleType)))
    val centerSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("cn2",
        org.apache.spark.sql.types.DoubleType)))
    val picks = scala.collection.mutable.ArrayBuffer.empty[Row]
    val seedAgg = cand
      .agg(min_by(struct(col("vec_id"), col("v"), col("nv2")),
        col("vec_id"))).head()
    if (!seedAgg.isNullAt(0)) {
      val s0 = seedAgg.getStruct(0)
      picks += Row(1, s0.get(0), null)
      // newest center rides as a 1-row LocalRelation each pass
      var newId: Any = s0.get(0)
      var newCenter = spark.createDataFrame(
        java.util.Arrays.asList(Row(s0.getSeq[Double](1),
          s0.getDouble(2))), centerSchema)
      // running-min state; null md = "no center scored yet" (pass 1)
      var state = cand.withColumn("md", lit(null).cast("double"))
      var prevPersisted: DataFrame = null
      var step = 2
      var exhausted = false
      while (step <= k && !exhausted) {
        val next = state
          .filter(col("vec_id") =!= lit(newId))
          .crossJoin(broadcast(newCenter))
          .withColumn("dnew",
            col("nv2") + col("cn2") - lit(2.0) * dot(col("v"), col("cv")))
          // least(null, d) = d, so pass 1 seeds the state; thereafter
          // the running least equals min-over-all-centers bit for bit
          .withColumn("md", least(col("md"), col("dnew")))
          .select(col("vec_id"), col("v"), col("nv2"), col("md"))
          .persist(disk)
        // the argmax head() materializes `next`; only then drop the
        // previous state so no consumer ever re-derives it
        val winAgg = next.agg(min_by(
          struct(col("vec_id"), col("v"), col("nv2"), col("md")),
          struct((-col("md")).as("nm"), col("vec_id")))).head()
        if (prevPersisted != null) prevPersisted.unpersist(blocking = false)
        if (winAgg.isNullAt(0)) { exhausted = true; prevPersisted = next }
        else {
          val w = winAgg.getStruct(0)
          picks += Row(step, w.get(0),
            BigDecimal(w.getDouble(3))
              .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
          newId = w.get(0)
          newCenter = spark.createDataFrame(
            java.util.Arrays.asList(Row(w.getSeq[Double](1),
              w.getDouble(2))), centerSchema)
          state =
            if ((step - 1) % checkpointEvery == 0) {
              val cut = Checkpoints.cut(next)
              next.unpersist(blocking = false)
              prevPersisted = null
              cut
            } else { prevPersisted = next; next }
          step += 1
        }
      }
      if (prevPersisted != null) prevPersisted.unpersist(blocking = false)
    }
    cand.unpersist(blocking = false)
    spark.createDataFrame(java.util.Arrays.asList(picks.toSeq: _*),
      outSchema)
  }
}
