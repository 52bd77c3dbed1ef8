package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-trained DECISION STUMP — the depth-1 CART split (Breiman et
  * al. 1984) on one integer feature, binary label: evaluate EVERY
  * distinct-value threshold by weighted Gini impurity and keep the
  * argmin. The third fully-oracle-checked trained model next to
  * [[NaiveBayes]] (m15) and the IRLS logistic (m16) — tree ENSEMBLES
  * stay MLlib/spec-gated, but the split-selection arithmetic they
  * stack is pinned here bit-for-bit.
  *
  * Exactness: the corpus collapses to the distinct-value histogram
  * `(x, cnt, pos)`; left/right class counts at every threshold are
  * INTEGER prefix sums ([[Aggregates.bucketedPrefixSums]] — partition-
  * parallel, no global window); the weighted Gini is one fixed-order
  * double chain, 9dp-rounded BEFORE the argmin with the threshold as
  * tie-break, so 1-ulp drift cannot flip the chosen split. Side
  * majorities break ties toward negative (explicit, engine-free).
  *
  * Scale shape: one map-side-combinable histogram agg, prefix sums
  * over DISTINCT values, a broadcast 1-row total, one min_by global
  * agg. Cost is bounded by feature cardinality, not rows.
  *
  * Output (one row): `threshold` (split is `x <= threshold`),
  * `wgini`, totals `n`/`pos`, left counts `n_left`/`pos_left`, the
  * per-side majority predictions, the training confusion
  * `tp/fp/tn/fn`, and `acc`.
  */
object Stump {

  def train(df: DataFrame, xCol: String, labelCol: String): DataFrame =
    trainImpl(df, xCol, labelCol, persist = false).df

  /** [[train]] with the value histogram persisted (read by the prefix
    * sums — twice internally — and the totals) and handed back for
    * release — the form the bench queries run. The plain form is
    * unhinted: leak-free, re-scanning the input per consumer.
    */
  def trainCached(df: DataFrame, xCol: String, labelCol: String): Cached =
    trainImpl(df, xCol, labelCol, persist = true)

  private def trainImpl(df: DataFrame, xCol: String, labelCol: String,
                        persist: Boolean): Cached = {
    val hist = df
      .filter(col(xCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(xCol).cast("long").as("__x"))
      .agg(count(lit(1)).as("__cnt"),
        sum(col(labelCol).cast("long")).as("__pos"))
      .transform(d =>
        if (persist) d.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else d)
    val cum = Aggregates.bucketedPrefixSums(hist, "__x",
      ascending = true, sumCols = Seq("__cnt", "__pos"))
    val tot = hist.agg(sum(col("__cnt")).as("__N"),
      sum(col("__pos")).as("__P"))
    val nL = col("cum___cnt")
    val pL = col("cum___pos")
    val nR = col("__N") - nL
    val pR = col("__P") - pL
    def gini(n: org.apache.spark.sql.Column,
             p: org.apache.spark.sql.Column) = {
      val pd = p.cast("double") / n.cast("double")
      val qd = (n - p).cast("double") / n.cast("double")
      lit(1.0) - pd * pd - qd * qd
    }
    val wg = (nL.cast("double") * gini(nL, pL) +
      nR.cast("double") * gini(nR, pR)) / col("__N").cast("double")
    val best = cum.crossJoin(broadcast(tot))
      // threshold at max(x) leaves the right side empty — not a split
      .filter(nL < col("__N"))
      .withColumn("__wg", round(wg, 9))
      .agg(min_by(
        struct(col("__x"), col("__wg"), nL.as("__nl"), pL.as("__pl"),
          col("__N"), col("__P")),
        struct(col("__wg"), col("__x"))).as("__b"))
      // degenerate inputs (empty, or one distinct x) have no valid
      // split: emit ZERO rows like the oracle, not one all-null row
      .filter(col("__b").isNotNull)
      .select(col("__b.__x").as("threshold"), col("__b.__wg").as("wgini"),
        col("__b.__N").as("n"), col("__b.__P").as("pos"),
        col("__b.__nl").as("n_left"), col("__b.__pl").as("pos_left"))
    // per-side majority (ties -> negative), training confusion from
    // the same integer counts — no second data pass
    val out = best
      .withColumn("pred_left",
        (col("pos_left") * 2 > col("n_left")).cast("int"))
      .withColumn("pred_right",
        ((col("pos") - col("pos_left")) * 2 >
          (col("n") - col("n_left"))).cast("int"))
      .withColumn("tp",
        when(col("pred_left") === 1, col("pos_left")).otherwise(0L) +
          when(col("pred_right") === 1, col("pos") - col("pos_left"))
            .otherwise(0L))
      .withColumn("fp",
        when(col("pred_left") === 1, col("n_left") - col("pos_left"))
          .otherwise(0L) +
          when(col("pred_right") === 1,
            (col("n") - col("n_left")) - (col("pos") - col("pos_left")))
            .otherwise(0L))
      .withColumn("fn", col("pos") - col("tp"))
      .withColumn("tn", col("n") - col("pos") - col("fp"))
      .withColumn("acc",
        round((col("tp") + col("tn")).cast("double") /
          col("n").cast("double"), 7))
    Cached(out, if (persist) Seq(hist) else Seq.empty)
  }
}
