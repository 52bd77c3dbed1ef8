package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised categorical encodings for model features (beyond the
  * reference surface — its pipeline label-encodes categories by
  * alphabetical index, `ml/FeaturePipeline`; target statistics are
  * the higher-capacity standard for tree/linear models on
  * high-cardinality categoricals).
  *
  * Smoothed target encoding (Micci-Barreca 2001):
  * `te(c) = (Σ y_c + m·μ) / (n_c + m)` — the category's label mean
  * shrunk toward the global prior μ by pseudo-count m, so rare
  * categories don't memorize their few labels.
  *
  * Leave-one-out variant: each ROW's encoding excludes its own label,
  * `loo_i = (Σ y_c − y_i) / (n_c − 1)` — the leakage-safe form for
  * training folds (a row never sees itself); singleton categories get
  * null (nothing to borrow).
  *
  * Scale shape: one grouped aggregation over (category) plus a
  * broadcast of the category stats back onto the rows — no window, no
  * shuffle of the fact table beyond the stats agg. All numerators are
  * exact integer sums and every division is spelled identically in
  * the oracle, so the encoded doubles hash-match cross-engine.
  */
object Encodings {

  /** Per-row frame with `te` (smoothed) and `loo` (leave-one-out)
    * target-encoding columns appended. `labelCol` must be integral
    * 0/1 (cast upstream); null categories form their own group, the
    * grouped-agg semantics.
    */
  def targetEncode(df: DataFrame, catCol: String, labelCol: String,
                   m: Int = 20): DataFrame = {
    require(m >= 0, s"pseudo-count m must be >= 0, got $m")
    val rows = df.withColumn("__y", col(labelCol).cast("long"))
    val stats = rows.groupBy(col(catCol).as("__cat"))
      .agg(count(lit(1)).as("__n_c"), sum(col("__y")).as("__sum_c"))
    val glob = rows.agg(count(lit(1)).as("__n"), sum(col("__y")).as("__sum"))
    rows
      .join(broadcast(stats), col(catCol) <=> col("__cat"))
      .crossJoin(broadcast(glob))
      .withColumn("te",
        (col("__sum_c").cast("double")
          + lit(m.toDouble)
            * (col("__sum").cast("double") / col("__n").cast("double")))
          / (col("__n_c").cast("double") + lit(m.toDouble)))
      .withColumn("loo",
        when(col("__n_c") > 1,
          (col("__sum_c") - col("__y")).cast("double")
            / (col("__n_c") - 1).cast("double")))
      .drop("__cat", "__n_c", "__sum_c", "__n", "__sum", "__y")
  }

  /** Hashing-trick vectorizer (Weinberger et al. 2009; sklearn's
    * FeatureHasher / Vowpal Wabbit's default encode): each categorical
    * cell becomes the token `"col=value"`, hashed to one of 4096
    * buckets — first 3 md5-hex chars, the [[Dsir]] bucket idiom, so an
    * external SQL engine reproduces every assignment bit-for-bit —
    * with a ±1 sign from the 4th hex digit's high bit. The signed
    * trick makes colliding tokens cancel in expectation instead of
    * biasing the bucket (the Weinberger inner-product guarantee).
    *
    * Why it matters at 100 TB: unlike label/one-hot/target encoding
    * there is NO vocabulary job, no fit, no stats frame — the encode
    * is stateless and scan-local, high-cardinality categoricals
    * (user ids, URLs) cost the same as low, and train/serve skew is
    * impossible because serving hashes exactly the same strings.
    *
    * Appends `outCol`: an array of (token, bucket, sign) structs, one
    * per non-null categorical cell, in `catCols` order.
    */
  def featureHash(df: DataFrame, catCols: Seq[String],
                  outCol: String = "fh"): DataFrame = {
    require(catCols.nonEmpty, "at least one categorical column")
    val feats = catCols.map { c =>
      val tok = concat(lit(c + "="), col(c).cast("string"))
      val h = md5(tok.cast("binary"))
      when(col(c).isNotNull, struct(tok.as("token"),
        substring(h, 1, 3).as("bucket"),
        when(substring(h, 4, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1)
          .otherwise(-1).as("sign")))
    }
    df.withColumn(outCol, filter(array(feats: _*), x => x.isNotNull))
  }

  /** [[featureHash]] in long form — one row per (row, feature) with
    * `token`/`bucket`/`sign` columns, the shape a hashed design-matrix
    * aggregation (column sums, gradient folds) consumes directly.
    */
  def featureHashLong(df: DataFrame, catCols: Seq[String]): DataFrame =
    featureHash(df, catCols, "__fh")
      .withColumn("__f", explode(col("__fh")))
      .select((df.columns.map(col) :+ col("__f.token").as("token") :+
        col("__f.bucket").as("bucket") :+ col("__f.sign").as("sign")): _*)
}
