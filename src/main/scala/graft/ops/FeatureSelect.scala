package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Filter-method feature ranking by mutual information — "which
  * columns are worth giving the model?" answered before any model is
  * fit. The reference hand-picks its feature set
  * (`FD/features.py`, consumed at `FD/model.py:95`); at 100-TB scale
  * with hundreds of
  * candidate columns the ranking itself must be a distributed
  * operator.
  *
  * For each discrete feature X (caller buckets continuous ones) against
  * the discrete label Y:
  *  - `mi`  = Σ_{v,y} p(v,y)·ln(p(v,y)/(p(v)p(y)))  — information gain,
  *  - `hx`, `hy` — marginal entropies,
  *  - `su`  = 2·mi/(hx+hy) — symmetric uncertainty, the
  *    scale-normalized score comparable ACROSS features with different
  *    cardinalities (raw MI inflates with |X|).
  *
  * Engine-exactness: every probability is a ratio of exact BIGINT
  * counts; each cell takes ONE transcendental (`ln`), 9dp-rounded,
  * then multiplies back onto its integer count in exact DECIMAL(32,9)
  * and sums exactly (the t12/m16 discipline) — partition order cannot
  * smear bits, so MI hashes identically cross-engine.
  *
  * Scale shape: one melt scan (explode over F features), ONE grouped
  * count on (feature, value, label) — map-side combined — and the
  * marginals re-aggregate from that cell frame without rescanning the
  * table. Joins are on (feature, value) / (feature) / label keys:
  * cell cardinality Σ_f |X_f|·|Y|, never rows. No windows, no driver
  * round-trip.
  */
object FeatureSelect {

  // |ln| of any count ratio here is < 100, so (11,9) holds it; the
  // count factor gets (20,0) and the product lands at DECIMAL(32,9) --
  // inside the 38 cap on BOTH engines, so no silent scale reduction
  // (Spark truncates scale to 6 when a product overflows precision 38)
  private val decLn = DecimalType(11, 9)
  private val decN = DecimalType(20, 0)

  /** Per-feature MI/entropy ranking frame: (feature, n_values, mi, hx,
    * hy, su), features and label compared as strings (discrete by
    * contract; null is its own category).
    */
  def mutualInfo(df: DataFrame, featureCols: Seq[String],
                 labelCol: String): DataFrame =
    build(df, featureCols, labelCol, persist = false).df

  /** [[mutualInfo]] with the (feature, value, label) cell frame
    * persisted: the marginals and N all re-aggregate from it, so the
    * plain form re-runs the melt scan four times — four full passes
    * over the fact table at 100 TB, for a frame that is sketch-sized
    * (Σ_f |X_f|·|Y| rows). Release after the consuming action.
    */
  def mutualInfoCached(df: DataFrame, featureCols: Seq[String],
                       labelCol: String): Cached =
    build(df, featureCols, labelCol, persist = true)

  private def build(df: DataFrame, featureCols: Seq[String],
                    labelCol: String, persist: Boolean): Cached = {
    require(featureCols.nonEmpty, "at least one feature column")
    val melted = df.select(explode(array(featureCols.map { f =>
      struct(lit(f).as("feature"), col(f).cast("string").as("v"),
        col(labelCol).cast("string").as("y"))
    }: _*)).as("m")).select(col("m.feature"), col("m.v"), col("m.y"))
    val cells0 = melted.groupBy(col("feature"), col("v"), col("y"))
      .agg(count(lit(1)).as("n_vy"))
    val cells =
      if (persist) cells0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else cells0
    val fv = cells.groupBy(col("feature").as("__f1"), col("v").as("__v1"))
      .agg(sum(col("n_vy")).as("n_v"))
    // label marginal and N are label-only: identical for every feature
    // (each feature contributes every row to the melt exactly once)
    val y = cells.filter(col("feature") === featureCols.head)
      .groupBy(col("y").as("__y1")).agg(sum(col("n_vy")).as("n_y"))
    val n = cells.filter(col("feature") === featureCols.head)
      .agg(sum(col("n_vy")).as("n")).select(col("n"))
    val joined = cells
      .join(fv, col("feature") === col("__f1") && col("v") <=> col("__v1"))
      .join(broadcast(y), col("y") <=> col("__y1"))
      .crossJoin(broadcast(n))
    val lnRatio = round(log(
      (col("n").cast("double") * col("n_vy").cast("double")) /
        (col("n_v").cast("double") * col("n_y").cast("double"))), 9)
    val miTerms = joined
      .withColumn("__mi_c",
        lnRatio.cast(decLn) * col("n_vy").cast(decN))
      .groupBy(col("feature"))
      .agg(sum(col("__mi_c")).as("__mi_s"),
        max(col("n")).as("__n"))
    val hxTerms = fv
      .crossJoin(broadcast(n))
      .withColumn("__hx_c",
        round(log(col("n_v").cast("double") / col("n").cast("double")), 9)
          .cast(decLn) * col("n_v").cast(decN))
      .groupBy(col("__f1").as("feature"))
      .agg(sum(col("__hx_c")).as("__hx_s"),
        count(lit(1)).as("n_values"))
    val hy = y.crossJoin(broadcast(n))
      .withColumn("__hy_c",
        round(log(col("n_y").cast("double") / col("n").cast("double")), 9)
          .cast(decLn) * col("n_y").cast(decN))
      .agg(sum(col("__hy_c")).as("__hy_s"), max(col("n")).as("__n2"))
    val out = miTerms.join(hxTerms, "feature").crossJoin(broadcast(hy))
      .withColumn("mi",
        col("__mi_s").cast("double") / col("__n").cast("double"))
      .withColumn("hx",
        -(col("__hx_s").cast("double") / col("__n").cast("double")))
      .withColumn("hy",
        -(col("__hy_s").cast("double") / col("__n").cast("double")))
      .withColumn("su",
        when(col("hx") + col("hy") > 0.0,
          lit(2.0) * col("mi") / (col("hx") + col("hy"))))
      .select(col("feature"), col("n_values"), col("mi"), col("hx"),
        col("hy"), col("su"))
    Cached(out, if (persist) Seq(cells) else Seq.empty)
  }
}
