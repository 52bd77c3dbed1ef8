package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** HASH-EXACT k-means — Lloyd's algorithm (1957/1982) in integer
  * fixed-point over 2-d quantized features, the fraud-segmentation /
  * price-band clustering the reference approximates with manual
  * thresholds. Unlike MLlib's KMeans (random init, double centroids —
  * spec-gated territory), every quantity here is an integer decision:
  *
  *  - points are integer-valued (cents, counts — caller quantizes);
  *  - init is the deterministic grid midpoint rule
  *    `c_j = min + ((2j+1)·(max−min)) div 2k` per axis;
  *  - assignment minimizes the EXACT integer squared distance
  *    `(x−cx)² + (y−cy)²`, ties to the lowest centroid index;
  *  - the update is the TRUNCATED integer mean (`div` ≡ DuckDB `//`,
  *    both truncate toward zero), so centroids stay integers.
  *
  * Every iteration is therefore bit-reproducible on any engine, and
  * the m20 oracle replays all of it — init, `iters` assign/update
  * rounds, and the final inertia — as unrolled SQL (the g02 PageRank
  * discipline applied to clustering).
  *
  * Scale shape: the corpus collapses ONCE to the distinct-value
  * histogram `(x, y, w)` (one map-side-combinable agg — the w08/w13
  * trick: all later work scales with DISTINCT pairs, not rows); each
  * iteration is a scan of that histogram against the BROADCAST k-row
  * centroid table (k·|hist| candidate rows, one min_by agg). No
  * windows, no driver loops — the per-iteration centroid frame is the
  * only thing that leaves the executors, and it is k rows.
  *
  * Output per cluster: `(j, n, cx, cy, inertia)` — population, the
  * integer centroid, and the exact within-cluster squared-distance sum
  * (DECIMAL(38,0)-accumulated, emitted as its exact double for the
  * oracle hash).
  */
object Clustering {

  def kmeansExact2d(df: DataFrame, xCol: String, yCol: String,
                    k: Int, iters: Int): DataFrame =
    kmeansExact2dImpl(df, xCol, yCol, k, iters, persist = false).df

  /** [[kmeansExact2d]] with the distinct-value histogram persisted
    * (every Lloyd iteration rescans it against the broadcast centroid
    * frame) and handed back for release — the form the bench queries
    * run. The plain form is unhinted: leak-free, re-deriving the
    * histogram once per iteration (correct, `iters`× the scan cost).
    */
  def kmeansExact2dCached(df: DataFrame, xCol: String, yCol: String,
                          k: Int, iters: Int): Cached =
    kmeansExact2dImpl(df, xCol, yCol, k, iters, persist = true)

  private def kmeansExact2dImpl(df: DataFrame, xCol: String, yCol: String,
                                k: Int, iters: Int,
                                persist: Boolean): Cached = {
    require(k >= 2 && iters >= 1, "k >= 2 and iters >= 1")
    val dec38 = DecimalType(38, 0)
    val hist = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__w"))
      .transform(d =>
        if (persist) d.persist(StorageLevel.MEMORY_AND_DISK) else d)
    val bounds = hist.agg(min(col("__x")).as("__xmin"),
      max(col("__x")).as("__xmax"),
      min(col("__y")).as("__ymin"), max(col("__y")).as("__ymax"))
    // grid-midpoint init: j-th centroid at the center of the j-th of k
    // equal spans — deterministic, data-dependent only through min/max
    var cent = df.sparkSession.range(k).toDF("__j")
      .crossJoin(broadcast(bounds))
      .select(col("__j"),
        expr(s"__xmin + ((2 * __j + 1) * (__xmax - __xmin)) div ${2 * k}")
          .as("__cx"),
        expr(s"__ymin + ((2 * __j + 1) * (__ymax - __ymin)) div ${2 * k}")
          .as("__cy"))
    val d2 = (col("__x") - col("__cx")) * (col("__x") - col("__cx")) +
      (col("__y") - col("__cy")) * (col("__y") - col("__cy"))
    def assigned(c: DataFrame): DataFrame = hist
      .crossJoin(broadcast(c))
      .withColumn("__d2", d2)
      .groupBy(col("__x"), col("__y"))
      .agg(min(col("__w")).as("__w"),
        min_by(struct(col("__j"), col("__d2")),
          struct(col("__d2"), col("__j"))).as("__win"))
      .select(col("__x"), col("__y"), col("__w"),
        col("__win.__j").as("__j"), col("__win.__d2").as("__d2"))
    for (_ <- 1 to iters) {
      val a = assigned(cent)
      // cut the iteration lineage: each centroid frame is exactly ≤ k
      // rows, so it materializes to a LocalRelation (the e01
      // materializeBounded contract) — without this, iteration i
      // re-derives every previous assignment pass from scratch
      cent = Layout.materializeBounded(
        a.groupBy(col("__j"))
          .agg(sum(col("__w")).as("__n"),
            // cast BEFORE the multiply (the inertia rule below): x·w
            // in long overflows past 2^63 at real feature magnitudes
            sum(col("__x").cast(dec38) * col("__w")).as("__sx"),
            sum(col("__y").cast(dec38) * col("__w")).as("__sy"))
          .select(col("__j"),
            expr("CAST(__sx div __n AS BIGINT)").as("__cx"),
            expr("CAST(__sy div __n AS BIGINT)").as("__cy")),
        maxRows = k.toLong)
    }
    val out = assigned(cent)
      .groupBy(col("__j").as("j"))
      .agg(sum(col("__w")).as("n"),
        // cast BEFORE the multiply: d2·w can pass 2^63 (d2 ~ 1e14 ×
        // histogram weights) — long overflow would corrupt silently
        sum(col("__d2").cast(dec38) * col("__w")).cast("double")
          .as("inertia"))
      .join(broadcast(cent.select(col("__j").as("j"), col("__cx").as("cx"),
        col("__cy").as("cy"))), Seq("j"))
      .select(col("j"), col("n"), col("cx"), col("cy"), col("inertia"))
    Cached(out, if (persist) Seq(hist) else Seq.empty)
  }
}
