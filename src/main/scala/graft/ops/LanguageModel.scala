package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical language-model quality filtering (the CCNet recipe,
  * simplified to a word-bigram model): fit n-gram statistics on a
  * reference corpus, score every candidate document by its average
  * surprisal −mean ln P(w₂|w₁) under add-k smoothing. Low surprisal =
  * looks like the reference corpus; high = gibberish, boilerplate, or
  * out-of-domain — the standard signal for corpus quality banding.
  *
  * Scale design: the tokenized corpus persists once and feeds both
  * model aggregations (bigram counts and vocab; context counts derive
  * from the bigram table — no extra corpus pass); scoring is an
  * equi-join of document bigrams against the bigram table (shuffle ∝
  * token stream, never vocab²). The vocab size rides along as a
  * broadcast one-row frame.
  */
object LanguageModel {

  private def bigrams(toks: Column): Column =
    when(size(toks) < 2,
      array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2"))))

  private def toks(textCol: Column): Column =
    TextAnalysis.tokens(lower(textCol))

  /** Per-document average bigram surprisal of `docs` under a model
    * fitted on `corpus` (self-scoring — corpus == docs — is the usual
    * quality-filter shape). Documents with fewer than two tokens have
    * no bigrams and drop out. Returns (doc_id, surprisal, n_bigrams)
    * plus the persisted tokenized-corpus frame via [[Cached]]: the
    * bigram-count and vocab aggregations both consume it, so the
    * corpus scans/tokenizes ONCE; call `.release()` after the scoring
    * action. [[bigramSurprisal]] is the plain-DataFrame convenience
    * for one-shot sessions (same contract as the Dedup pipelines).
    */
  def bigramSurprisalCached(corpus: DataFrame, docs: DataFrame,
                            textCol: String, idCol: String,
                            k: Double = 1.0): Cached = {
    require(k > 0, "smoothing constant must be positive")
    val ctoks = Layout.fanOut(corpus)
      .select(toks(col(textCol)).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = ctoks.select(explode(bigrams(col("toks"))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
    val vocab = ctoks.select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val db = Layout.fanOut(docs).select(col(idCol).as("doc_id"),
        toks(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(bigrams(col("toks"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // add-k: P(w2|w1) = (c(w1,w2)+k) / (c(w1·)+k·V); unseen contexts
    // degrade to the uniform 1/V
    val scored = db.join(cb, Seq("w1", "w2"), "left")
      .join(cu, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        // an empty corpus has V = 0: no model exists, so surprisal is
        // null rather than log(1/0) = +∞ poisoning the average
        when(col("v") === 0, lit(null)).otherwise(
          log((coalesce(col("cb"), lit(0L)) + k) /
            (coalesce(col("cu"), lit(0L)) + lit(k) * col("v")))))
      .groupBy(col("doc_id"))
      .agg((-avg(col("logp"))).as("surprisal"),
        count(lit(1)).as("n_bigrams"))
    Cached(scored, Seq(ctoks))
  }

  def bigramSurprisal(corpus: DataFrame, docs: DataFrame,
                      textCol: String, idCol: String,
                      k: Double = 1.0): DataFrame =
    bigramSurprisalCached(corpus, docs, textCol, idCol, k).df
}
