package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier as PURE DataFrame algebra —
  * a trainable model whose training AND scoring replay completely in
  * an external SQL engine, unlike the MLlib fits (whose RNG/quasi-
  * Newton internals are oracle-proof and spec-gated). The canonical
  * first model of every text-routing pipeline (language ID, topic
  * routing, spam triage).
  *
  * Train (add-one smoothing): per class c, prior ln(n_c/N); per
  * (class, term), likelihood ln((cnt + 1)/(tot_c + V)) over the
  * TRAINING vocabulary V — two grouped aggregations over the token
  * stream plus one vocabulary × class frame. Terms outside the
  * training vocabulary are ignored at scoring time (the standard MNB
  * convention, stated identically in the oracle).
  *
  * Score: explode test tokens (duplicates kept — term frequency IS
  * the multinomial statistic), join the model on the term (AQE
  * broadcasts the |V|·|classes| frame while it is small; no forced
  * hint — a web-scale vocabulary must be allowed to shuffle), and
  * fold each
  * (doc, class) score TERM-SORTED (the bm25 engine-exactness
  * discipline). Every ln is rounded 9dp BEFORE summation, so the
  * fold adds identical doubles in an identical order cross-engine and
  * argmax cannot flip on a last-ulp difference; prediction tie-break
  * is the smallest class name via min(struct(-score, class)).
  *
  * Scale shape: training is two grouped aggs (shuffle = token
  * stream); scoring shuffles (doc, class) partial scores; no windows,
  * no driver loops, no collect.
  */
object NaiveBayes {

  private def toks(c: org.apache.spark.sql.Column) =
    split(trim(lower(c)), "\\s+")

  /** Train: returns (classModel, termModel).
    * classModel: (cls, ln_prior_r) — ln(n_c/N) rounded 9dp.
    * termModel: (cls, term, ln_p_r) — one row per (class, vocabulary
    * term) including zero-count pairs (smoothed), ln rounded 9dp.
    *
    * `minDf` (default 1 = off, oracle parity): prune terms appearing
    * in fewer than `minDf` DOCUMENTS from the vocabulary before the
    * class×vocab grid — standard NB practice (sklearn
    * CountVectorizer's min_df) and the scale lever for the
    * (class, term) likelihood frame: vocabulary grows ~Heaps-law with
    * the corpus and the growth is ALL rare tail (hapax legomena), so a
    * small floor caps the grid the way a37's basket cap bounds pair
    * counts. With pruning on, token totals and smoothing V count only
    * KEPT terms (the model stays a proper distribution over its own
    * vocabulary); pruned terms behave exactly like unseen terms at
    * scoring time (ignored).
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            minDf: Int = 1): (DataFrame, DataFrame) = {
    require(minDf >= 1, "minDf >= 1 (1 = no pruning)")
    val labeled = docs.select(col(labelCol).cast("string").as("cls"),
      toks(col(textCol)).as("toks"))
    val nDocs = labeled.agg(count(lit(1)).as("n")).select(col("n"))
    val classes = labeled.groupBy(col("cls"))
      .agg(count(lit(1)).as("n_c"))
    val classModel = classes.crossJoin(broadcast(nDocs))
      .select(col("cls"),
        round(log(col("n_c").cast("double") / col("n").cast("double")), 9)
          .as("ln_prior_r"))
    val allTokens = labeled.select(col("cls"),
      explode(col("toks")).as("term"))
    // document frequency without a doc id: distinct terms PER ROW
    // (array_distinct before the explode), then one grouped count —
    // each (doc, term) incidence contributes exactly once
    val vocabKept =
      if (minDf <= 1) allTokens.select(col("term")).distinct()
      else labeled
        .select(explode(array_distinct(col("toks"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= minDf).select(col("term"))
    val tokens =
      if (minDf <= 1) allTokens
      else allTokens.join(vocabKept, Seq("term"), "left_semi")
    val counts = tokens.groupBy(col("cls"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val totals = tokens.groupBy(col("cls")).agg(count(lit(1)).as("tot"))
    val vocab = vocabKept
    val vSize = vocab.agg(count(lit(1)).as("v")).select(col("v"))
    // class list × vocabulary dense grid: broadcast the CLASS side —
    // it is the provably tiny one (label cardinality), while vocab is
    // corpus-sized. Hinting also satisfies the CartesianGuard interlock.
    val termModel = broadcast(classes.select(col("cls")))
      .crossJoin(vocab)
      .join(counts, Seq("cls", "term"), "left")
      .join(totals, Seq("cls"))
      .crossJoin(broadcast(vSize))
      .select(col("cls"), col("term"),
        round(log((coalesce(col("cnt"), lit(0L)).cast("double") + 1.0)
          / (col("tot").cast("double") + col("v").cast("double"))), 9)
          .as("ln_p_r"))
    (classModel, termModel)
  }

  /** Score + predict: each test doc gets its argmax class. Returns
    * (id, cls) — `cls` the predicted class. Docs whose tokens all
    * fall outside the training vocabulary score prior-only.
    */
  def predict(docs: DataFrame, textCol: String, idCol: String,
              classModel: DataFrame, termModel: DataFrame): DataFrame = {
    val tokens = docs.select(col(idCol).as("id"),
      explode(toks(col(textCol))).as("term"))
    // no broadcast hint on the term model: |V|·|classes| grows with
    // the corpus, and AQE will still broadcast it while it is small —
    // forcing the hint would OOM the driver on a web-scale vocabulary
    val perClass = tokens.join(termModel, Seq("term"))
      .groupBy(col("id"), col("cls"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("ln_p_r")))),
        lit(0.0), (acc, x) => acc + x.getField("ln_p_r")).as("ll"))
    // every doc scores EVERY class (prior-only when no vocab hits):
    // right-join the class list, then add priors
    val allPairs = docs.select(col(idCol).as("id"))
      .crossJoin(broadcast(classModel))
      .join(perClass, Seq("id", "cls"), "left")
      .select(col("id"), col("cls"),
        (coalesce(col("ll"), lit(0.0)) + col("ln_prior_r")).as("score"))
    allPairs.groupBy(col("id"))
      .agg(min(struct((-col("score")).as("ns"), col("cls"))).as("m"))
      .select(col("id"), col("m.cls").as("cls"))
  }
}
