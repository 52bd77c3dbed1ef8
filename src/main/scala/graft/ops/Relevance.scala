package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring for training-data pipelines: TF-IDF
  * document-term weights and BM25 query scoring — the standard tools
  * for boilerplate down-weighting, topic filtering, and targeted
  * corpus selection (e.g. "give me the documents most about X" before
  * an expensive annotation pass).
  *
  * Scale design: one explode over tokens, then everything is grouped
  * aggregation on (doc, term) / (term) keys — shuffle volume is the
  * token stream, never documents × vocabulary. Corpus-level scalars
  * (N, average length) ride along as a broadcast one-row frame. All
  * arithmetic is spelled identically to the DuckDB oracles so the
  * scores hash-match (integer tf/df/N, per-row double formula, and
  * the per-doc BM25 sum folds in term order — cross-engine-exact).
  */
object Relevance {

  private def toks(textCol: Column): Column =
    TextAnalysis.tokens(lower(textCol))

  /** Document-term TF-IDF with sklearn's smoothed idf:
    * `idf = ln((N+1)/(df+1)) + 1`, score = tf · idf. Returns
    * (doc_id, term, tf, df, tfidf) — one row per distinct document
    * term; downstream callers window for top-terms-per-doc or
    * threshold for filtering.
    */
  def tfidf(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val exploded = Layout.fanOut(df).select(col(idCol).as("doc_id"),
      explode(toks(col(textCol))).as("term"))
    val tf = exploded.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency from the per-doc term rows themselves — no
    // second pass over the raw text
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("idf",
        log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1)
      .withColumn("tfidf", col("tf") * col("idf"))
      .select("doc_id", "term", "tf", "df", "tfidf")
  }

  /** Corpus vocabulary with document-frequency pruning — the
    * CountVectorizer-style preprocessing cut: (term, tf, df) for every
    * term kept by `minDf <= df` and `df <= maxDfRatio · N` (the rare-
    * typo floor and the stopword-like ceiling). One explode + two
    * grouped aggs; the corpus row count rides along as a broadcast
    * one-row frame, so the ceiling is a plan-time predicate, not a
    * driver constant baked per run.
    */
  def vocabulary(df: DataFrame, textCol: String, idCol: String,
                 minDf: Long = 1L, maxDfRatio: Double = 1.0): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(maxDfRatio > 0 && maxDfRatio <= 1.0,
      s"maxDfRatio in (0,1], got $maxDfRatio")
    val exploded = Layout.fanOut(df)
      .select(col(idCol).as("__doc"), explode(toks(col(textCol))).as("term"))
    val perDoc = exploded.groupBy(col("__doc"), col("term"))
      .agg(count(lit(1)).as("__tf"))
    val stats = perDoc.groupBy(col("term"))
      .agg(sum(col("__tf")).as("tf"), count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    stats.crossJoin(broadcast(n))
      .filter(col("df") >= minDf &&
        col("df").cast("double") <= lit(maxDfRatio) * col("__n"))
      .select("term", "tf", "df")
  }

  /** Windowed token co-occurrence with pointwise mutual information —
    * the collocation/phrase-mining signal (word2vec-era SGNS trains
    * against exactly these windowed pair statistics). For each token
    * position, the pair (token, each of the next `window` tokens) is
    * counted once, unordered (pair members sort lexicographically);
    * `pmi = ln(p(a,b) / (p(a)·p(b)))` with pair probabilities over the
    * pair count and unigram probabilities over the token count.
    *
    * Scale shape: pair generation is a scan-local HOF over the token
    * array (no positional self-join — the naive spelling joins the
    * exploded position stream to itself, shuffling the corpus twice),
    * then everything is grouped aggregation on (a,b) / (token) keys
    * with map-side partials; corpus totals ride along as a broadcast
    * one-row frame. Output is bounded by `minPairs` — the long tail of
    * hapax pairs never leaves the first aggregation.
    *
    * Parity: counts are exact integers; the single ln() rounds 9dp
    * (the t09 stance on transcendentals).
    */
  def pmi(df: DataFrame, textCol: String, idCol: String,
          window: Int = 5, minPairs: Long = 5L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val base = Layout.fanOut(df)
      .select(col(idCol).as("__doc"), toks(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
    // unigram counts over ALL tokens (incl. single-token docs that can
    // never form a pair) — the marginal a pair's tokens are scored by
    val uni = base.select(explode(col("__t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val totals = base.agg(sum(col("__n")).as("n_tok"))
    // Spark's sequence(start, stop) DESCENDS when start > stop, so a
    // 1-token doc would generate [0, -1]; filter before sequencing
    val pairs = base.filter(col("__n") >= 2)
      .select(explode(flatten(transform(
        sequence(lit(0), col("__n") - 2), i =>
          transform(sequence(i + 1, least(i + window, col("__n") - 1)), j =>
            struct(
              least(element_at(col("__t"), i + 1),
                element_at(col("__t"), j + 1)).as("a"),
              greatest(element_at(col("__t"), i + 1),
                element_at(col("__t"), j + 1)).as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pc = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_pair"))
    val npairs = pairs.agg(count(lit(1)).as("n_pairs_total"))
    pc.filter(col("n_pair") >= minPairs)
      .join(uni.select(col("tok").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("tok").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(npairs))
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_pair"), col("c_a"), col("c_b"),
        round(log(
          (col("n_pair").cast("double") / col("n_pairs_total")) /
            ((col("c_a").cast("double") / col("n_tok")) *
              (col("c_b").cast("double") / col("n_tok")))), 9).as("pmi"))
  }

  /** BM25 score of every document against a bag of query terms
    * (Robertson idf; k1/b defaults per the literature). The term filter
    * prunes the exploded stream before any shuffle, so cost is
    * ∝ matching tokens. The per-document sum folds term-sorted
    * (sequential double fold) for engine-exact reproducibility.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val base = Layout.fanOut(df).select(col(idCol).as("doc_id"),
        toks(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    // token counts are integers: their double sum is exact, so avgdl is
    // engine-identical
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scoredTerms = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("score",
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") +
            lit(k1) * (lit(1) - b + lit(b) * col("dl") / col("avgdl"))))
    scoredTerms.groupBy(col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("score")))),
        lit(0.0), (acc, x) => acc + x.getField("score")).as("bm25"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) — corpus
    * keywords as the PageRank of the word co-occurrence graph, a
    * straight composition of two oracle-proven pieces: [[pmi]]'s
    * windowed pair generation (scan-local, minPairs prunes the hapax
    * tail) feeds [[Graph.pageRank]]'s integer fixed-point iteration
    * (bit-identical across engines, string nodes work unchanged —
    * every stage is key-generic). Top-k by (rank desc, token).
    */
  def textRank(df: DataFrame, textCol: String, idCol: String,
               window: Int = 5, minPairs: Long = 40L, iters: Int = 3,
               topK: Int = 20): DataFrame = {
    val edges = pmi(df, textCol, idCol, window, minPairs)
      .select(col("a").as("u"), col("b").as("v"))
    Graph.pageRank(edges, iters = iters)
      .orderBy(col("rank").desc, col("node")).limit(topK)
  }

  /** Multi-query BM25 retrieval — [[bm25]] generalized from one
    * hardcoded term bag to a QUERY TABLE, the batch-retrieval shape a
    * RAG / targeted-selection pipeline runs: N queries × top-k docs in
    * ONE pass over the corpus.
    *
    * Inverted-index topology: the corpus explodes to postings once,
    * pruned to the query vocabulary by a broadcast semi-join BEFORE
    * the (doc, term) shuffle — cost is ∝ matching tokens, independent
    * of query count until the final per-(query, doc) fold. Per-doc
    * term scores are computed once and fanned out to the queries that
    * contain the term (broadcast — query terms are tiny next to the
    * corpus). The per-(query, doc) sum is round(score,7) → DECIMAL —
    * order-independent and exact, so it runs as a plain codegen'd
    * spillable HashAggregate. (The original term-sorted collect_list
    * fold achieved determinism by ORDERING the double adds, but its
    * per-group object state OOM'd the ObjectHashAggregate at the 50×
    * asymptote probe — unbounded group payloads don't spill the way a
    * fixed-width decimal sum does.) The per-query top-k runs on the
    * bounded mergeable [[graft.functions.TopKAgg]] heap — no
    * `row_number` window funneling a query's whole candidate set
    * through one reducer (the ANN-finisher discipline).
    *
    * `queries` must expose (qIdCol, qTextCol); query terms are its
    * distinct tokens. Output: (query_id, doc_id, bm25, rank),
    * rank 1..k by (score desc, doc_id asc).
    */
  def bm25Retrieval(docs: DataFrame, queries: DataFrame,
                    textCol: String, idCol: String,
                    qIdCol: String, qTextCol: String,
                    k: Int = 10, k1: Double = 1.2,
                    b: Double = 0.75): DataFrame = {
    val base = Layout.fanOut(docs).select(col(idCol).as("doc_id"),
        toks(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val qterms = queries.select(col(qIdCol).as("query_id"),
        explode(array_distinct(toks(col(qTextCol)))).as("term"))
      .distinct()
    val vocab = qterms.select(col("term")).distinct()
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(vocab), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score",
        log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1) /
          (col("tf") +
            lit(k1) * (lit(1) - b + lit(b) * col("dl") / col("avgdl"))))
    val perDoc = scored.join(broadcast(qterms), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(round(col("score"), 7).cast("decimal(27,7)"))
        .cast("double").as("bm25"))
    perDoc.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("bm25"), col("doc_id"), k)
        .as("__tk"))
      .select(col("query_id"), explode(col("__tk")).as("__e"))
      .select(col("query_id"), col("__e.id").as("doc_id"),
        col("__e.score").as("bm25"), col("__e.rank").as("rank"))
  }

  /** ZIPF'S-LAW slope of the corpus vocabulary — the log-log OLS fit
    * of frequency against rank over the top `topN` terms. Natural text
    * sits near slope −1; a corpus drifting toward −0.6 (flat =
    * templated/boilerplate-heavy) or −1.5 (spiky = scraped duplicates,
    * degenerate tokenization) fails the corpus-health gate, which is
    * why Zipf diagnostics sit in every large-corpus audit toolbox.
    *
    * Takes ANY `(term, tf)` frame (feed it [[vocabulary]] — factored,
    * the n16b pattern). Rank ties break on term; ln outputs round to
    * 7dp before the order-free DECIMAL moment sums (ln is
    * transcendental — the t09/t21 discipline); slope and intercept are
    * fixed-order double chains, intercept computed FROM the rounded
    * slope so both engines share its exact-decimal input.
    *
    * Scale shape: TakeOrdered topN from the vocabulary aggregation,
    * then all algebra on ≤ topN rows — the corpus term is the
    * vocabulary scan that produced the input frame.
    *
    * Output: one row `(n_terms, slope, intercept)`.
    */
  def zipfSlope(vocab: DataFrame, topN: Int = 100): DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    val top = Layout.materializeBounded(
      vocab.select(col("term"), col("tf"))
        .orderBy(col("tf").desc, col("term").asc).limit(topN),
      maxRows = 1000000L)
    val w = Window.orderBy(col("tf").desc, col("term").asc)
    val ranked = top.withColumn("__r", row_number().over(w))
    val lx = round(log(col("__r").cast("double")), 7)
    val ly = round(log(col("tf").cast("double")), 7)
    val d7 = "decimal(18,7)"
    val agg = ranked.agg(count(lit(1)).as("__n"),
      sum(lx.cast(d7)).as("__sx"), sum(ly.cast(d7)).as("__sy"),
      sum(round(lx * ly, 7).cast(d7)).as("__sxy"),
      sum(round(lx * lx, 7).cast(d7)).as("__sxx"))
    val nd = col("__n").cast("double")
    def D(n: String): Column = col(n).cast("double")
    val denom = nd * D("__sxx") - D("__sx") * D("__sx")
    val slope = when(denom =!= 0.0,
      round((nd * D("__sxy") - D("__sx") * D("__sy")) / denom, 7))
    agg.withColumn("__sl", slope)
      .select(col("__n").cast("long").as("n_terms"),
        col("__sl").as("slope"),
        round((D("__sy") - col("__sl") * D("__sx")) / nd, 7)
          .as("intercept"))
  }
}
