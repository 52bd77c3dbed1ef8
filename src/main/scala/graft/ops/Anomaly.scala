package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multivariate anomaly screening — the unsupervised fraud filter the
  * reference approximates with per-feature thresholds
  * (`FD/consumer.py:60-66` scores one feature at a time; a stolen-card
  * burst is only visible in the JOINT (amount, velocity) distribution).
  *
  * Mahalanobis distance² of each row from its group's centroid under
  * the group's covariance: `m2 = (p-μ)ᵀ Σ⁻¹ (p-μ)`, the classic
  * elliptic-envelope score. Under bivariate normality m2 ~ χ²(2), so
  * `m2 > 13.8155` (the 99.9% quantile) is a principled outlier flag —
  * unlike raw z-scores it is scale-free and catches points that are
  * unremarkable per-axis but off the correlation ridge.
  *
  * Engine-exactness (the w08/m16 discipline): inputs are quantized to
  * integers by the caller (cents, counts), the five moment sums
  * accumulate as exact DECIMAL(38,0) — partition order cannot smear
  * bits — and every double derivation (means, variances, covariance,
  * determinant, quadratic form) is written with one fixed
  * parenthesization that the DuckDB oracle mirrors term for term. The
  * per-row score is 7dp-rounded before any cross-row aggregate.
  *
  * Scale shape: ONE grouped aggregation (six map-side-combined sums)
  * builds the stats frame, which re-enters via broadcast join — group
  * cardinality is unbounded, nothing touches the driver, scoring is
  * scan-local. The same shape a 100-TB fit wants.
  */
object Anomaly {

  private val dec38 = DecimalType(38, 0)

  /** Per-group exact-moment stats frame `(__sg, __n, __mx, __my,
    * __vx, __vy, __cxy, __det)` — the shared front half of the
    * Mahalanobis screen and the 2-d PCA. Biased (ML) covariance:
    * vx = Sxx/n − mx², cxy = Sxy/n − mx·my. Each sum crosses
    * decimal→double ONCE; everything after is a fixed-order double
    * chain the oracle restates verbatim.
    */
  private[ops] def stats2(rows: DataFrame, groupCol: String,
                          xCol: String, yCol: String): DataFrame = {
    val xd = col(xCol).cast(dec38)
    val yd = col(yCol).cast(dec38)
    rows.groupBy(col(groupCol).as("__sg"))
      .agg(count(lit(1)).as("__n"),
        sum(xd).as("__sx"), sum(yd).as("__sy"),
        sum(xd * xd).as("__sxx"), sum(yd * yd).as("__syy"),
        sum(xd * yd).as("__sxy"))
      .withColumn("__nd", col("__n").cast("double"))
      .withColumn("__mx", col("__sx").cast("double") / col("__nd"))
      .withColumn("__my", col("__sy").cast("double") / col("__nd"))
      .withColumn("__vx",
        col("__sxx").cast("double") / col("__nd") -
          col("__mx") * col("__mx"))
      .withColumn("__vy",
        col("__syy").cast("double") / col("__nd") -
          col("__my") * col("__my"))
      .withColumn("__cxy",
        col("__sxy").cast("double") / col("__nd") -
          col("__mx") * col("__my"))
      .withColumn("__det",
        col("__vx") * col("__vy") - col("__cxy") * col("__cxy"))
      .select(col("__sg"), col("__n"), col("__mx"), col("__my"),
        col("__vx"), col("__vy"), col("__cxy"), col("__det"))
  }

  /** Per-group bivariate Mahalanobis². Appends `m2Col` (7dp-rounded,
    * null when the group's covariance is singular, i.e. `det <= 0` —
    * fewer than 3 rows or collinear features) plus the group stats
    * (`__n`, `__mx`, `__my`, `__vx`, `__vy`, `__cxy`) when
    * `keepStats`. `xCol`/`yCol` must be integer-valued (cast upstream:
    * cents, counts) — that is what makes the moment sums exact.
    */
  def mahalanobis2PerGroup(df: DataFrame, groupCol: String,
                           xCol: String, yCol: String,
                           m2Col: String = "m2",
                           keepStats: Boolean = false): DataFrame = {
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val stats = stats2(rows, groupCol, xCol, yCol)
    val dx = col(xCol).cast("double") - col("__mx")
    val dy = col(yCol).cast("double") - col("__my")
    // ((dx²·vy − 2·dx·dy·cxy) + dy²·vx) / det — the 2×2 inverse folded
    // into the quadratic form; left-associative like the SQL twin
    val m2 = (dx * dx * col("__vy") - lit(2.0) * dx * dy * col("__cxy")
      + dy * dy * col("__vx")) / col("__det")
    val scored = rows
      // unhinted: the stats frame has one row PER GROUP and group
      // cardinality is unbounded here — a forced broadcast collects it
      // to the driver (OOM/size-cap risk at 100 TB). AQE broadcasts
      // anyway whenever the frame measures small at runtime.
      .join(stats, col(groupCol) <=> col("__sg"))
      .withColumn(m2Col,
        when(col("__det") > 0.0, round(m2, 7)))
    if (keepStats) scored.drop("__sg", "__det")
    else scored.drop("__sg", "__n", "__mx", "__my", "__vx", "__vy",
      "__cxy", "__det")
  }

  /** Per-group simple linear regression (OLS) in closed form on the
    * shared exact-moment machinery — the per-segment trend fit
    * (price-per-unit curves, drift slopes) that sklearn's
    * `LinearRegression` would do segment-by-segment on pandas frames.
    * In biased-moment terms: slope = cxy/vx, intercept = my − slope·mx,
    * r² = cxy²/(vx·vy), residual variance = vy − cxy²/vx — each a
    * fixed-order double chain over the decimal-exact sums, so the whole
    * fit is hash-exact under the oracle. Degenerate groups (vx = 0:
    * constant x) yield null fit columns; r² additionally requires
    * vy > 0.
    *
    * Scale shape: ONE grouped aggregation (six map-side-combined sums),
    * nothing per-row re-enters — the cheapest possible fit at any group
    * cardinality. `xCol`/`yCol` must be integer-valued (cents, counts).
    *
    * Output per group: (grp, n, slope, intercept, r2, resvar).
    */
  def olsPerGroup(df: DataFrame, groupCol: String,
                  xCol: String, yCol: String): DataFrame = {
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    stats2(rows, groupCol, xCol, yCol)
      .withColumn("__slope",
        when(col("__vx") > 0.0, col("__cxy") / col("__vx")))
      .withColumn("__icept",
        when(col("__vx") > 0.0,
          col("__my") - col("__slope") * col("__mx")))
      .withColumn("__r2",
        when(col("__vx") > 0.0 && col("__vy") > 0.0,
          col("__cxy") * col("__cxy") / (col("__vx") * col("__vy"))))
      .withColumn("__resvar",
        when(col("__vx") > 0.0,
          col("__vy") - col("__cxy") * col("__cxy") / col("__vx")))
      .select(col("__sg").as("grp"), col("__n").as("n"),
        round(col("__slope"), 7).as("slope"),
        round(col("__icept"), 7).as("intercept"),
        round(col("__r2"), 7).as("r2"),
        round(col("__resvar"), 7).as("resvar"))
  }

  /** Per-group TWO-FEATURE RIDGE regression in closed form — the
    * multi-feature step past [[olsPerGroup]]'s single slope, with the
    * L2 penalty that keeps the fit stable when the two features are
    * collinear (exactly the regime where plain OLS' 2×2 solve blows
    * up). Minimizes Σ(y − b0 − b1·x1 − b2·x2)² + λ(b1² + b2²) —
    * intercept unpenalized, the standard parameterization — via the
    * explicit 2×2 solve on CENTERED sums:
    *
    *   det = (S11+λ)(S22+λ) − S12²
    *   b1  = ((S22+λ)·S1y − S12·S2y) / det
    *   b2  = ((S11+λ)·S2y − S12·S1y) / det,  b0 = ȳ − b1·x̄1 − b2·x̄2
    *
    * Exactness: the nine raw moment sums accumulate as DECIMAL(38,0)
    * (inputs must be integer-valued — cents, counts), centered sums
    * are one fixed-order double chain (Sab = sab − sa·sb/n), and the
    * solve is pure double algebra replayed term-for-term by the
    * oracle; 7dp-rounded outputs. λ = 0 degrades to exact 2-feature
    * OLS; det ≤ 0 (degenerate: constant features at λ = 0) yields
    * null coefficients.
    *
    * Scale shape: ONE grouped aggregation (nine map-side-combined
    * sums), nothing per-row re-enters — [[olsPerGroup]]'s cost at any
    * group cardinality.
    *
    * Output per group: (grp, n, b1, b2, b0).
    */
  def ridge2PerGroup(df: DataFrame, groupCol: String, x1Col: String,
                     x2Col: String, yCol: String,
                     lambda: Double): DataFrame = {
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val rows = df.filter(col(x1Col).isNotNull && col(x2Col).isNotNull &&
      col(yCol).isNotNull)
    val x1 = col(x1Col).cast(dec38)
    val x2 = col(x2Col).cast(dec38)
    val y = col(yCol).cast(dec38)
    val agg = rows.groupBy(col(groupCol).as("__sg"))
      .agg(count(lit(1)).as("__n"),
        sum(x1).as("__s1"), sum(x2).as("__s2"), sum(y).as("__sy"),
        sum(x1 * x1).as("__s11"), sum(x2 * x2).as("__s22"),
        sum(x1 * x2).as("__s12"),
        sum(x1 * y).as("__s1y"), sum(x2 * y).as("__s2y"))
    val nd = col("__n").cast("double")
    def c(sab: String, sa: String, sb: String) =
      col(sab).cast("double") -
        col(sa).cast("double") * col(sb).cast("double") / nd
    agg
      .withColumn("__c11", c("__s11", "__s1", "__s1"))
      .withColumn("__c22", c("__s22", "__s2", "__s2"))
      .withColumn("__c12", c("__s12", "__s1", "__s2"))
      .withColumn("__c1y", c("__s1y", "__s1", "__sy"))
      .withColumn("__c2y", c("__s2y", "__s2", "__sy"))
      .withColumn("__det",
        (col("__c11") + lambda) * (col("__c22") + lambda) -
          col("__c12") * col("__c12"))
      .withColumn("__b1",
        when(col("__det") > 0.0,
          ((col("__c22") + lambda) * col("__c1y") -
            col("__c12") * col("__c2y")) / col("__det")))
      .withColumn("__b2",
        when(col("__det") > 0.0,
          ((col("__c11") + lambda) * col("__c2y") -
            col("__c12") * col("__c1y")) / col("__det")))
      .withColumn("__b0",
        when(col("__det") > 0.0,
          col("__sy").cast("double") / nd -
            col("__b1") * (col("__s1").cast("double") / nd) -
            col("__b2") * (col("__s2").cast("double") / nd)))
      .select(col("__sg").as("grp"), col("__n").as("n"),
        round(col("__b1"), 7).as("b1"),
        round(col("__b2"), 7).as("b2"),
        round(col("__b0"), 7).as("b0"))
  }

  /** Per-group 2-d PCA by the closed-form symmetric eigendecomposition
    * — the correlation-ridge direction and how much of the joint
    * variance it carries. For the 2×2 covariance the eigenpairs are
    * exact algebra (λ = (tr ± √(df² + 4c²))/2, e₁ ∝ (c, λ₁−vx)), so
    * unlike iterative PCA the whole thing — eigenvalues, variance
    * explained, unit principal direction, and the per-row projection
    * audit Σp₁²/n = λ₁ — sits on a hash-exact oracle. (Full d-dim PCA
    * rides [[Similarity.covarianceMatrix]] + a driver eigensolver and
    * stays spec-gated; this is the oracle-certified 2-d core.)
    *
    * Output per group: `n`, eigenvalues `l1 >= l2`, `evr` = l1/(l1+l2),
    * the sign-canonical unit eigenvector (`e1x >= 0`), and the exact
    * decimal sums of the integer-rounded squared projections on both axes
    * (`p1sq_sum`/`n` ≈ l1 is the built-in self-audit).
    *
    * Scale shape: identical to the Mahalanobis screen — one 6-sum
    * grouped agg, broadcast stats join, scan-local projection, one
    * final per-group agg.
    */
  def pca2PerGroup(df: DataFrame, groupCol: String,
                   xCol: String, yCol: String): DataFrame = {
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val stats = stats2(rows, groupCol, xCol, yCol)
      .withColumn("__disc",
        sqrt((col("__vx") - col("__vy")) * (col("__vx") - col("__vy"))
          + lit(4.0) * col("__cxy") * col("__cxy")))
      .withColumn("__l1",
        (col("__vx") + col("__vy") + col("__disc")) / lit(2.0))
      .withColumn("__l2",
        (col("__vx") + col("__vy") - col("__disc")) / lit(2.0))
      // eigenvector of λ₁: (cxy, λ₁ − vx), axis-aligned when cxy = 0
      .withColumn("__rx",
        when(col("__cxy") === 0.0,
          when(col("__vx") >= col("__vy"), lit(1.0)).otherwise(lit(0.0)))
          .otherwise(col("__cxy")))
      .withColumn("__ry",
        when(col("__cxy") === 0.0,
          when(col("__vx") >= col("__vy"), lit(0.0)).otherwise(lit(1.0)))
          .otherwise(col("__l1") - col("__vx")))
      .withColumn("__len",
        sqrt(col("__rx") * col("__rx") + col("__ry") * col("__ry")))
      // canonical sign: e1x > 0, or e1y > 0 on the vertical axis
      .withColumn("__sgn",
        when(col("__rx") < 0.0 ||
          (col("__rx") === 0.0 && col("__ry") < 0.0), lit(-1.0))
          .otherwise(lit(1.0)))
      .withColumn("__e1x", col("__sgn") * col("__rx") / col("__len"))
      .withColumn("__e1y", col("__sgn") * col("__ry") / col("__len"))
    val p1 = (col(xCol).cast("double") - col("__mx")) * col("__e1x") +
      (col(yCol).cast("double") - col("__my")) * col("__e1y")
    val p2 = -(col(xCol).cast("double") - col("__mx")) * col("__e1y") +
      (col(yCol).cast("double") - col("__my")) * col("__e1x")
    rows
      // unhinted: the stats frame has one row PER GROUP and group
      // cardinality is unbounded here — a forced broadcast collects it
      // to the driver (OOM/size-cap risk at 100 TB). AQE broadcasts
      // anyway whenever the frame measures small at runtime.
      .join(stats, col(groupCol) <=> col("__sg"))
      // integer-rounded squares: scale-0 decimals convert to double in
      // ONE correctly-rounded step on both engines (a scale-2 decimal
      // would double-round in DuckDB at ~1e19 units and drift 1 ulp)
      .withColumn("__p1sq", round(p1 * p1, 0).cast(DecimalType(38, 0)))
      .withColumn("__p2sq", round(p2 * p2, 0).cast(DecimalType(38, 0)))
      .groupBy(col(groupCol).as("grp"))
      .agg(min(col("__n")).as("n"),
        min(col("__l1")).as("l1"), min(col("__l2")).as("l2"),
        (min(col("__l1")) / (min(col("__l1")) + min(col("__l2"))))
          .as("evr"),
        min(col("__e1x")).as("e1x"), min(col("__e1y")).as("e1y"),
        sum(col("__p1sq")).cast("double").as("p1sq_sum"),
        sum(col("__p2sq")).cast("double").as("p2sq_sum"))
  }

  /** HALF-SPACE-TREE anomaly mass (Tan, Ting & Liu, IJCAI 2011) — the
    * unsupervised density screen that scores a row by how many
    * training rows share its leaf across an ensemble of random-split
    * trees: sparse leaves = anomalies. Two deliberate divergences from
    * the randomized paper, both in the service of the hash oracle:
    * the per-node feature is a fixed ROTATION (tree t splits feature
    * (t+d) mod p at depth d) instead of a random draw, and every split
    * is the node range's MIDPOINT (the paper's work-space bisection,
    * made deterministic). Midpoint bisection on a fixed feature
    * sequence collapses to closed form: feature f used M times in tree
    * t contributes its M leading "binary digits", so the leaf id is a
    * per-feature integer cell — computed in PURE INTEGER arithmetic
    * (`((x − min)·2^M) div (max − min + 1)`), no float, no rounding
    * boundary anywhere in the operator.
    *
    * Output: the `topK` LOWEST-mass rows `(id, m0.., score)` — score =
    * Σ_t leafMass_t(x), the audit frontier — ties broken on id.
    *
    * Scale shape: one min/max aggregation (broadcast 1 row), one
    * grouped count bounded by trees·2^depth leaves (broadcast), one
    * scan-local scoring pass, TakeOrdered frontier. Nothing per-row
    * shuffles; the mass tables are the only state — the same
    * constant-memory property the paper exploits for streams.
    */
  def halfSpaceMass(df: DataFrame, idCol: String, features: Seq[String],
                    depth: Int = 7, topK: Int = 20): DataFrame = {
    val p = features.length
    require(p >= 2, s"need >= 2 features, got $p")
    require(depth >= p && depth <= 20, s"depth in [$p,20], got $depth")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val rows = df
      .filter(features.map(col(_).isNotNull).reduce(_ && _))
      .select(col(idCol).cast("string").as("__id") +:
        features.zipWithIndex.map { case (f, i) =>
          col(f).cast("long").as(s"__x$i") }: _*)
    val aggs = features.indices.flatMap(i => Seq(
      min(col(s"__x$i")).as(s"__mn$i"),
      max(col(s"__x$i")).as(s"__mx$i")))
    val mm = rows.agg(aggs.head, aggs.tail: _*)
    // uses(t)(f) = how often tree t splits feature f in `depth` levels
    def uses(t: Int, f: Int): Int =
      (0 until depth).count(d => (t + d) % p == f)
    // Overflow guard: the leaf cell computes (x − mn)·2^m with m =
    // uses(t,f), a Long product that wraps (ANSI: throws) when a
    // feature's range exceeds 2^63 / 2^m. One collect of the 1-row
    // min/max frame (already computed, driver-bounded) makes the
    // documented input-range contract fail loudly up front instead of
    // mid-scan.
    val mmRow = mm.first()
    features.indices.foreach { i =>
      if (!mmRow.isNullAt(2 * i) && !mmRow.isNullAt(2 * i + 1)) {
        val range = mmRow.getLong(2 * i + 1) - mmRow.getLong(2 * i)
        val mUse = (0 until p).map(t => uses(t, i)).max
        require(range >= 0L && range < (Long.MaxValue >> mUse),
          s"halfSpaceMass: feature '${features(i)}' range $range " +
            s"exceeds the overflow bound 2^${63 - mUse} for depth=" +
            s"$depth (cell arithmetic (x-min)*2^$mUse must stay " +
            "< 2^63); rescale the feature or reduce depth")
      }
    }
    // leaf id of tree t: per-feature integer cells composed in the
    // tree's rotation order (bijective with the bit-interleaved path)
    def leafExpr(t: Int): Column =
      (0 until p).map(k => (t + k) % p).foldLeft(lit(0L)) { (acc, f) =>
        val m = uses(t, f)
        val cell = expr(s"((__x$f - __mn$f) * ${1L << m}) div " +
          s"(__mx$f - __mn$f + 1)")
        acc * lit(1L << m) + cell
      }
    // re-broadcast the already-collected stats row as a literal frame
    // so the guard's collect is the ONLY min/max scan
    val mmLocal = df.sparkSession.createDataFrame(
      java.util.Collections.singletonList(mmRow), mm.schema)
    val trees = features.indices
    val leaves = rows.crossJoin(broadcast(mmLocal))
      .select(col("__id") +:
        trees.map(t => leafExpr(t).as(s"__leaf$t")): _*)
    val leavesP = leaves.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one mass table per tree, each bounded by 2^depth rows
    val massed = trees.foldLeft(leavesP.toDF()) { (acc, t) =>
      val mass = leavesP.groupBy(col(s"__leaf$t"))
        .agg(count(lit(1)).as(s"m$t"))
      acc.join(broadcast(mass), Seq(s"__leaf$t"))
    }
    val out = massed
      .withColumn("score", trees.map(t => col(s"m$t")).reduce(_ + _))
      .select(col("__id").as("id") +:
        trees.map(t => col(s"m$t")) :+ col("score"): _*)
      .orderBy(col("score").asc, col("id").asc)
      .limit(topK)
    val pinned = Layout.materializeBounded(out, maxRows = 1000000L)
    leavesP.unpersist(blocking = false)
    pinned
  }
}
