package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every corpus
  * document by how much more likely its hashed n-gram features are
  * under a TARGET distribution (curated, high-quality, in-domain text)
  * than under the RAW corpus distribution, then keep the top-weighted
  * documents. This shifts a web-scale corpus toward a target domain
  * without training a classifier — the standard pretraining-mixture
  * curation recipe.
  *
  * Scale design: both feature distributions are B-bucket histograms
  * (one explode + grouped count each, map-side combined), the
  * log-ratio model is a B-row frame broadcast into the scoring join,
  * and each document's weight is one grouped sum over its own grams.
  * Nothing driver-side on the data path, nothing quadratic; corpus
  * cost is one tokenize/explode pass — the same shape as
  * [[Dedup.decontaminate]].
  *
  * Feature hashing is engine-portable: a gram's bucket is the first 3
  * hex chars of its md5 (B = 4096), so an external SQL engine
  * reproduces every bucket count bit-for-bit; only the final ln() is
  * transcendental, which the sm05 oracle absorbs by banding weights to
  * integers (the t12 LM-surprisal precedent).
  */
object Dsir {

  val NumBuckets = 4096

  /** Hashed unigram+bigram feature buckets of a text column: each
    * gram → first 3 md5-hex chars (12 bits). Word order enters through
    * the bigrams; the 4096-bucket collision rate is the dimensionality
    * knob DSIR's hashed generative model accepts by design.
    */
  def featureBuckets(text: Column): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val grams = when(size(toks) < 2, toks)
      .otherwise(concat(toks,
        transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i + 1),
            element_at(toks, i + 2)))))
    transform(grams, g => substring(md5(g.cast("binary")), 1, 3))
  }

  /** All 4096 bucket keys as a 1-column frame (lower-hex, 3 chars) —
    * generated, not collected, so the model frame is complete without
    * any driver round-trip.
    */
  private def allBuckets(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(NumBuckets)
      .select(lpad(lower(hex(col("id"))), 3, "0").as("bucket"))

  /** Per-bucket add-k–smoothed log-probability over a bucket stream
    * (one "bucket" column), complete over all 4096 buckets (unseen
    * buckets carry the smoothed floor), as ("bucket", "lp").
    */
  def bucketLogProbsFromGrams(grams: DataFrame, k: Double): DataFrame = {
    val counts = grams
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    allBuckets(grams.sparkSession)
      .join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(total))
      .select(col("bucket"),
        log((coalesce(col("n"), lit(0L)) + k) /
          (coalesce(col("total"), lit(0L)) + k * NumBuckets)).as("lp"))
  }

  /** [[bucketLogProbsFromGrams]] over a document set. */
  def bucketLogProbs(docs: DataFrame, textCol: String,
                     k: Double = 1.0): DataFrame =
    bucketLogProbsFromGrams(Layout.fanOut(docs)
      .select(explode(featureBuckets(col(textCol))).as("bucket")), k)

  /** Per-document importance weight: Σ over the doc's grams of
    * [log p_target(bucket) − log p_raw(bucket)]. Higher = more
    * target-like. Returns (idCol, "weight") plus the persisted
    * corpus-gram frame to release.
    *
    * The corpus tokenizes and explodes ONCE: the persisted
    * (id, bucket) frame feeds both the raw histogram and the per-doc
    * scoring sum (without the persist the dominant gram-generation
    * pass would run twice). The target — typically orders of magnitude
    * smaller — pays its own single pass; the 4096-row log-ratio model
    * broadcasts into the scoring join.
    */
  def importanceWeightsCached(corpus: DataFrame, target: DataFrame,
                              textCol: String, idCol: String,
                              k: Double = 1.0): Cached = {
    val corpusGrams = Layout.fanOut(corpus)
      .select(col(idCol), explode(featureBuckets(col(textCol))).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = bucketLogProbs(target, textCol, k)
      .withColumnRenamed("lp", "lp_t")
      .join(bucketLogProbsFromGrams(corpusGrams.select(col("bucket")), k)
        .withColumnRenamed("lp", "lp_r"), "bucket")
      .select(col("bucket"), (col("lp_t") - col("lp_r")).as("lr"))
    val weights = corpusGrams
      .join(broadcast(model), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("lr")).as("weight"))
    Cached(weights, Seq(corpusGrams))
  }

  /** Plain-DataFrame convenience for one-shot sessions (the
    * [[Dedup.minhashNearDups]] contract: the backing gram frame stays
    * persisted — use [[importanceWeightsCached]] to release it).
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
                        textCol: String, idCol: String,
                        k: Double = 1.0): DataFrame =
    importanceWeightsCached(corpus, target, textCol, idCol, k).df

  /** Keep the `n` most target-like documents (deterministic id
    * tie-break) — DSIR's top-k selection variant. One global
    * TakeOrderedAndProject over the weight frame.
    */
  def selectTop(corpus: DataFrame, target: DataFrame, textCol: String,
                idCol: String, n: Int, k: Double = 1.0): DataFrame =
    importanceWeights(corpus, target, textCol, idCol, k)
      .orderBy(col("weight").desc, col(idCol)).limit(n)
}
