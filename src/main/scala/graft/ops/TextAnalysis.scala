package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All pure column expressions over a text column — no UDFs, no
  * shuffles; every op is row-local and runs inside whole-stage codegen
  * (HOF array ops excepted), so a 100 TB corpus maps straight through
  * the scan with column pruning.
  */
object TextAnalysis {

  /** Whitespace tokenization (the "token count: whitespace" baseline). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Corpus length-band filter: keep rows whose token count falls in
    * the global [pLo, pHi] percentile band — the standard too-short /
    * too-long document cut. One bounds aggregation broadcast against
    * the corpus, then a scan-local filter; the token-count column
    * survives as `countCol` for downstream stats.
    *
    * `approx = true` is the 100-TB path: bounds come from
    * `approx_percentile` (bounded-memory mergeable sketch) instead of
    * exact `percentile` (which buffers every count on one aggregator).
    * Contract difference (spec-pinned): exact interpolates — on
    * integer counts the bound can be fractional — while approx returns
    * an actual corpus value whose rank is within n/`approxAccuracy`
    * of the requested percentile.
    */
  def lengthBand(df: org.apache.spark.sql.DataFrame, textCol: String,
                 pLo: Double = 0.05, pHi: Double = 0.95,
                 approx: Boolean = false, approxAccuracy: Int = 10000,
                 countCol: String = "n_tok")
      : org.apache.spark.sql.DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi,
      s"need 0 <= pLo <= pHi <= 1, got [$pLo, $pHi]")
    val withLen = df.withColumn(countCol, tokenCount(col(textCol)))
    val pct = (p: Double) =>
      if (approx) expr(s"approx_percentile($countCol, $p, $approxAccuracy)")
      else expr(s"percentile($countCol, $p)")
    val bounds = withLen.agg(pct(pLo).as("__lo"), pct(pHi).as("__hi"))
    withLen.crossJoin(broadcast(bounds))
      .filter(col(countCol) >= col("__lo") && col(countCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** BPE-ish subword count: word pieces + digit runs + punctuation
    * singles, approximating tokenizer behavior without a vocab. Counts
    * maximal runs of letters (split every 4 chars, a crude merge rule),
    * digits, and individual punctuation marks.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Corpus text normalization: delete NON-whitespace control
    * characters (C0 minus tab/newline/FF/CR, plus DEL) and
    * zero-width/BOM codepoints, then collapse every whitespace run —
    * including the surviving \t \n \f \r — to one space, and trim.
    * Whitespace controls collapse rather than delete so line breaks
    * keep separating words ("a\r\nb" → "a b", not "ab"). The first
    * cleaning pass every web-scraped corpus needs before
    * hashing/dedup — control and zero-width junk otherwise makes
    * visually-identical text hash differently.
    *
    * Dialect note: \\x0b (vertical tab) is DELETED in pass 1 because
    * Java's \\s includes it and RE2's does not — removing it first is
    * what lets the t17 oracle restate both passes verbatim with
    * identical meaning.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text,
        "[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f​‌‍﻿]", ""),
      "\\s+", " "))

  /** Unicode script profile: per-script character counts — the
    * script-identification signal web-corpus pipelines use alongside
    * n-gram language ID (mixed-script documents are a spam/mojibake
    * marker; script routing picks the right tokenizer). Each count is
    * `length − length(strip(class))`, a pure scan-local expression;
    * the ranges are plain codepoint intervals so the oracle restates
    * them in RE2 syntax with identical meaning.
    */
  def scriptCounts(text: Column): Column = {
    def n(cls: String) =
      (length(text) - length(regexp_replace(text, cls, ""))).cast("long")
    struct(
      n("[A-Za-z\\u00C0-\\u024F]").as("latin"),
      n("[\\u0400-\\u04FF]").as("cyrillic"),
      n("[\\u4E00-\\u9FFF]").as("cjk"),
      n("[\\u0600-\\u06FF]").as("arabic"),
      n("[0-9]").as("digit"),
      length(text).cast("long").as("total"))
  }

  /** Punctuation ratio over a fixed class (quality signal). */
  def punctRatio(text: Column): Column = {
    val stripped = regexp_replace(text, "[.,!?;:]", "")
    when(length(text) === 0, 0.0)
      .otherwise((length(text) - length(stripped)).cast("double") / length(text))
  }

  /** Ratio of tokens that are stopwords (quality + language signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks,
      t => t.isInCollection(stopwords.map(_.toLowerCase))))
    when(size(toks) === 0, 0.0)
      .otherwise(hits.cast("double") / size(toks))
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks))
  }

  /** Composite quality score in [0,1]: length band + stopword presence −
    * punctuation noise. A deliberately simple, fully-stated formula so
    * the oracle can restate it.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val swScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 10.0, lit(1.0))
    greatest(lit(0.0),
      least(lit(1.0),
        lenScore * 0.4 + swScore * 0.4 + (lit(1.0) - punctPenalty) * 0.2))
  }

  /** Per-language stopword seeds for the n-gram/stopword language-ID
    * heuristic (tiny closed lists — the point is the operator shape, a
    * scan-local scored argmax, not lexicon quality).
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"))

  /** Language ID: argmax of stopword hit counts, alphabetical tie-break,
    * "und" (undetermined) when nothing matches.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    // array_max picks the struct with max (hits, pref); pref is the
    // REVERSED alphabetical rank, so ties on hits resolve to the
    // alphabetically-smallest language.
    val best = array_max(array(
      langStopwords.toSeq.sortBy(_._1).reverse.zipWithIndex.map {
        case ((lang, sw), i) =>
          struct(size(filter(toks, t => t.isInCollection(sw))).as("hits"),
            lit(i).as("pref"), lit(lang).as("lang"))
      }: _*))
    when(best.getField("hits") === 0, "und").otherwise(best.getField("lang"))
  }

  /** Fixed-size token chunking with overlap — the standard
    * context-window splitter for LLM training corpora. Produces an
    * array of chunk strings; callers `explode` it into one row per
    * chunk. Stride = size − overlap; the final partial chunk is kept.
    */
  def chunkTokens(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(overlap < chunkSize, "overlap must be smaller than chunk size")
    val stride = chunkSize - overlap
    val toks = tokens(text)
    val nChunks = greatest(lit(1),
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"))
    transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * stride + 1, lit(chunkSize)), " "))
  }

  /** Concat-and-chunk sequence packing — the GPT-style training layout:
    * documents concatenate in ascending `idCol` order into one token
    * stream, which splits into fixed-`budget` sequences; each document
    * reports where its first token lands (sequence id + offset). The
    * running token count is a partition-parallel prefix sum
    * (`Aggregates.bucketedPrefixSums` — no global window, so the plan
    * scales to corpus-size inputs), and token counts are integers, so
    * the assignment is exact and engine-reproducible.
    */
  def packSequences(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, budget: Int)
      : org.apache.spark.sql.DataFrame = {
    require(budget > 0, "token budget must be positive")
    val counted = df.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
    Aggregates.bucketedPrefixSums(counted, "doc_id", ascending = true,
      Seq("n_tokens"))
      .withColumn("start_token", col("cum_n_tokens") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_token"),
        floor(col("start_token") / budget).cast("long").as("seq_id"),
        (col("start_token") % budget).as("seq_offset"))
  }

  /** First step of BPE tokenizer training (Sennrich et al. 2016
    * §3.1): fold the corpus into adjacent symbol-pair counts — each
    * word becomes its character sequence plus an end-of-word marker,
    * and every adjacent pair is counted weighted by word frequency.
    * The top pair is the merge rule a BPE trainer would apply next.
    *
    * Scale design: two grouped passes. The first collapses the corpus
    * to its distinct-word frequency table (map-side combine absorbs
    * the token stream; the shuffle carries distinct words, a
    * vocabulary-sized set, not the corpus). The second explodes pairs
    * over that table, so its cost is vocabulary-sized regardless of
    * corpus row count — the reason BPE training is feasible at 100 TB.
    */
  def bpePairCounts(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val words = Layout.fanOut(df)
      .select(explode(tokens(lower(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // chars + marker; indices below stay in bounds for any non-empty
    // word, so the element_at calls are ANSI-safe
    val syms = concat(split(col("word"), ""), array(lit("</w>")))
    words
      .select(col("freq"), explode(
        transform(sequence(lit(0), size(syms) - 2),
          i => struct(element_at(syms, i + 1).as("left"),
            element_at(syms, i + 2).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** Full BPE merge-rule training (Sennrich et al. 2016 §3.1): repeat
    * numMerges times — take the highest-count adjacent symbol pair
    * (ties: lexicographic (left, right), deterministic) and fuse it
    * everywhere. The corpus collapses ONCE to its distinct-word
    * frequency table (the only corpus-sized, distributed pass); the
    * merge loop then runs driver-side over the collected vocabulary —
    * bounded by `maxVocab` (the IVF/PQ bounded-fit contract), and
    * honest to how production tokenizer trainers work: BPE merges are
    * inherently sequential (each depends on the last), over a table
    * vocabulary-sized regardless of corpus rows. Distributed surfaces:
    * the vocab count here, the merge APPLICATION in
    * [[bpeApplyMerges]] (pure column expressions).
    *
    * Pair counts are maintained INCREMENTALLY, the way production
    * trainers do it: an inverted index (pair → word ids currently
    * containing it) confines each merge's bookkeeping to the words the
    * fused pair actually appears in, and a lazy-invalidation max-heap
    * (stale entries skipped against the live count at pop time) makes
    * selection O(log heap) instead of a full pair-table scan. Per-merge
    * cost is ∝ affected words, not numMerges × Σ|word| — a 32k-merge
    * vocabulary no longer recounts the whole symbol table 32k times.
    */
  def bpeTrainMerges(df: org.apache.spark.sql.DataFrame, textCol: String,
                     numMerges: Int, maxVocab: Int = 65536)
      : Seq[(String, String)] = {
    val vocabRows = Layout.fanOut(df)
      .select(explode(tokens(lower(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      // deterministic truncation for over-budget vocabularies: keep the
      // most frequent words (tie: lexicographic)
      .orderBy(col("freq").desc, col("word")).limit(maxVocab)
      .collect()
    val syms: Array[Array[String]] = vocabRows.map { r =>
      r.getString(0).split("").filter(_.nonEmpty) :+ "</w>"
    }
    val freqs: Array[Long] = vocabRows.map(_.getLong(1))

    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    val where = scala.collection.mutable
      .Map.empty[(String, String), scala.collection.mutable.Set[Int]]
    // dequeues the highest count, ties to the lexicographically
    // smallest (left, right) — identical to the full-recount maxBy
    val ord = Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
      Ordering.String.reverse)
    val heap = scala.collection.mutable
      .PriorityQueue.empty[(Long, String, String)](ord)
    // add (sign=+1) or retract (sign=-1) one word's adjacent-pair
    // contributions; pushes fresh heap entries on add, prunes the
    // inverted index on retract
    def contribute(w: Int, sign: Long): Unit = {
      val s = syms(w); val f = freqs(w) * sign
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val n = counts.getOrElse(p, 0L) + f
        if (n == 0L) counts.remove(p) else counts(p) = n
        // every change to a live count gets a fresh heap entry —
        // including decrements, or a pair lowered by a retraction and
        // never re-added would have only stale (higher) entries and
        // become unselectable despite holding the live maximum
        if (n > 0L) heap.enqueue((n, p._1, p._2))
        if (sign > 0L) {
          where.getOrElseUpdate(
            p, scala.collection.mutable.Set.empty[Int]) += w
        } else where.get(p).foreach { ws =>
          ws -= w; if (ws.isEmpty) where.remove(p)
        }
        j += 1
      }
    }
    var w = 0
    while (w < syms.length) { contribute(w, 1L); w += 1 }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < numMerges) {
      // pop until the top entry reflects a live count (lazy invalidation)
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (n, l, r) = heap.dequeue()
        if (counts.get((l, r)).contains(n)) best = (l, r)
      }
      if (best == null) i = numMerges
      else {
        merges += best
        val fused = best._1 + best._2
        // only words currently containing the fused pair change; each
        // retracts its old pairs, fuses greedily left-to-right, and
        // re-adds — every other word's counts are untouched
        val affected = where.get(best).map(_.toArray).getOrElse(Array.empty)
        affected.foreach { wi =>
          contribute(wi, -1L)
          val s = syms(wi)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == best._1 &&
                s(j + 1) == best._2) { out += fused; j += 2 }
            else { out += s(j); j += 1 }
          }
          syms(wi) = out.toArray
          contribute(wi, 1L)
        }
        i += 1
      }
    }
    merges.toSeq
  }

  /** Apply trained BPE merges to a single word column: characters +
    * end-of-word marker, then each merge folds left-to-right over the
    * symbol array (`aggregate`: fuse when the accumulator's tail is
    * the merge's left and the next symbol its right — exactly the
    * greedy non-overlapping pass a BPE tokenizer makes per rule).
    * Pure column expressions: tokenization of a 100 TB corpus stays
    * inside the scan, merges ship as literals in the plan.
    */
  def bpeApplyMerges(word: Column, merges: Seq[(String, String)]): Column = {
    val chars = concat(filter(split(word, ""), c => c =!= ""),
      array(lit("</w>")))
    merges.foldLeft(chars) { case (syms, (l, r)) =>
      aggregate(syms,
        array().cast("array<string>"),
        (acc, x) =>
          when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(x))))
    }
  }

  /** Repetition ratio: 1 − distinct n-grams / total n-grams — the
    * boilerplate/looping-text quality signal. 0 = no repetition.
    */
  def repetitionRatio(text: Column, n: Int): Column = {
    val toks = tokens(lower(text))
    val total = greatest(size(toks) - (n - 1), lit(0))
    val grams = transform(sequence(lit(0), greatest(total - 1, lit(0))),
      i => array_join(slice(toks, i + 1, lit(n)), " "))
    when(total <= 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(grams)).cast("double") / total)
  }

  /** PII redaction for training corpora: emails and international-ish
    * phone numbers replaced by typed placeholders. Patterns restricted
    * to the regex subset Java and RE2 agree on.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "[EMAIL]")
    regexp_replace(noEmail, "\\+?[0-9]{10,12}", "[PHONE]")
  }

  /** Content fingerprint: sha256 over the sorted distinct token set —
    * order-insensitive exact-duplicate key (the rolling-hash family's
    * set-hash variant; scan-local, joinable at any scale).
    */
  def fingerprint(text: Column): Column =
    sha2(concat_ws(" ", array_sort(array_distinct(tokens(lower(text))))), 256)

  /** Gopher-style quality-rule battery (Rae et al. 2021 §A1.1): the
    * standard document-level pre-training filters, restated as PURE
    * INTEGER comparisons so the decision is exact and engine-portable
    * (mean-word-length ∈ [3,10] ⟺ 3n ≤ Σlen ≤ 10n — no float division
    * anywhere). Returns a struct of per-rule booleans plus the overall
    * `pass`; scan-local, codegen-friendly, no shuffle.
    *
    * Rules: word count ∈ [minWords, maxWords]; mean word length ∈
    * [3, 10] chars; symbol-to-word ratio (`#` or `...`) ≤ 1/10; ≥ 80%
    * of words contain an alphabetic character; ≥ 2 stopword hits.
    * An empty document fails `words_ok` (and therefore `pass`);
    * ratio rules degenerate to true at n = 0 by construction.
    */
  def gopherRules(text: Column, stopwords: Seq[String],
                  minWords: Int = 30, maxWords: Int = 100000): Column = {
    require(minWords >= 1 && maxWords >= minWords, "bad word-count band")
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nSym = size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0)))
      .cast("long")
    val nStop = size(filter(tokens(lower(text)),
      t => t.isInCollection(stopwords.map(_.toLowerCase)))).cast("long")
    val wordsOk = n >= minWords && n <= maxWords
    val meanLenOk = sumLen >= lit(3L) * n && sumLen <= lit(10L) * n
    val symbolOk = lit(10L) * nSym <= n
    val alphaOk = lit(5L) * nAlpha >= lit(4L) * n
    val stopOk = nStop >= 2L
    struct(wordsOk.as("words_ok"), meanLenOk.as("mean_len_ok"),
      symbolOk.as("symbol_ok"), alphaOk.as("alpha_ok"),
      stopOk.as("stopword_ok"),
      (wordsOk && meanLenOk && symbolOk && alphaOk && stopOk).as("pass"))
  }

  /** Winnowing (the MOSS algorithm): robust LOCAL fingerprints — hash
    * every k-token gram, slide a w-hash window, keep each window's
    * minimum. Guarantees any shared run of ≥ w+k−1 tokens contributes a
    * shared fingerprint, so partial overlap is detectable where the
    * whole-document [[fingerprint]] is all-or-nothing. Pure column
    * expressions (scan-local); md5 keys keep the selection
    * engine-portable. Returns the sorted distinct fingerprint set.
    */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val grams = transform(Dedup.passages(tokens(lower(text)), k),
      g => md5(g.cast("binary")))
    val n = size(grams)
    // sliding window minimum as a SPARSE TABLE: doubling
    // zip_with(least) passes then one overlapped combine — O(n·log w)
    // with no per-window allocation, where the naive
    // array_min(slice(...)) per window was O(n·w) and dominated the
    // whole suite under the forced bench action (21 s -> the md5
    // floor). zip_with pads the shorter (shifted) side with nulls,
    // which `least` skips, so positions past n−w+1 hold partial-
    // window mins — the final slice drops exactly those; min's
    // idempotence makes the overlapped combine exact for any w.
    var m = grams
    var span = 1
    while (span * 2 <= w) {
      m = zip_with(m, slice(m, lit(span + 1), n), least(_, _))
      span *= 2
    }
    val wm = if (span < w) zip_with(m, slice(m, lit(w - span + 1), n),
      least(_, _)) else m
    sort_array(array_distinct(
      when(n <= w, array(array_min(grams)))
        .otherwise(slice(wm, lit(1), n - w + 1))))
  }

  /** TOKEN-DISTRIBUTION DIVERSITY per corpus slice: Shannon entropy
    * of the token frequency distribution, type-token ratio, and
    * normalized entropy H/ln(V) — the "is this source repetitive
    * boilerplate or diverse prose" screen that complements
    * [[logOddsKeyness]] (which says WHAT a slice over-represents;
    * this says HOW concentrated it is overall). A crawl source whose
    * normalized entropy collapses is template spam.
    *
    * Entropy terms are the one-transcendental-per-row discipline:
    * each token's `−p·ln p` is 9dp-rounded, DECIMAL(38,9)-summed
    * (partition order cannot smear bits), and only then surfaced as a
    * double; `ttr` and `norm_entropy` are fixed-order chains rounded
    * 7dp. Scale shape: one (group, token) count, one group re-agg —
    * vocabulary-bounded after the first agg.
    *
    * Output per group: (grp, n_tokens, n_types, ttr, entropy,
    * norm_entropy). Groups with one distinct token have ln(V) = 0 and
    * null norm_entropy.
    */
  def tokenEntropy(df: org.apache.spark.sql.DataFrame, groupCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val grpTok = df
      .filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).as("grp"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("y"))
    val tot = grpTok.groupBy(col("grp"))
      .agg(sum(col("y")).as("__n"), count(lit(1)).as("__v"))
    val p = col("y").cast("double") / col("__n").cast("double")
    grpTok.join(tot, Seq("grp"))
      .select(col("grp"), col("__n"), col("__v"),
        round(-(p * log(p)), 9).cast(dec9).as("__h"))
      .groupBy(col("grp"), col("__n"), col("__v"))
      .agg(sum(col("__h")).cast("double").as("__H"))
      .select(col("grp"), col("__n").as("n_tokens"),
        col("__v").as("n_types"),
        round(col("__v").cast("double") / col("__n").cast("double"), 7)
          .as("ttr"),
        col("__H").as("entropy"),
        when(col("__v") > 1,
          round(col("__H") / log(col("__v").cast("double")), 7))
          .as("norm_entropy"))
  }

  /** DISTINCTIVE TERMS per corpus slice — log-odds ratio with a flat
    * Dirichlet prior, z-scored (Monroe, Colaresi & Quinn, "Fightin'
    * Words", Political Analysis 2008): for each (group, token), how
    * over-represented the token is in the group vs the REST of the
    * corpus, normalized by its sampling variance. The keyness screen
    * that tells a mixture designer what each source actually
    * contributes — raw tf-idf overweights rare noise; the variance
    * term here shrinks low-count flukes toward zero.
    *
    *   δ  = ln((y+α)/(nᵢ+Vα−y−α)) − ln((yᵣ+α)/(nᵣ+Vα−yᵣ−α))
    *   σ² = 1/(y+α) + 1/(yᵣ+α),  z = δ/√σ²
    *
    * (y = group count, yᵣ = rest count, nᵢ/nᵣ = token totals, V =
    * vocabulary size, α = 0.5 flat prior.)
    *
    * Engine-exactness: all counts integer; the two `ln`s are the only
    * transcendentals and z is 7dp-rounded BEFORE ranking, with the
    * token as tie-break, so 1-ulp ln drift can't flip an ordering the
    * oracle sees. Scale shape: one (group, token) count off the scan,
    * a token-keyed re-agg for globals joined back on the token key, a
    * broadcast 1-row (V, n) frame, and the per-group top-k window over
    * VOCABULARY-sized rows — the corpus itself is never re-shuffled.
    *
    * Output: (grp, token, y, z, rank) for the top `k` tokens per
    * group by z.
    */
  def logOddsKeyness(df: org.apache.spark.sql.DataFrame, groupCol: String,
                     textCol: String,
                     k: Int = 5): org.apache.spark.sql.DataFrame =
    logOddsKeynessImpl(df, groupCol, textCol, k, persist = false).df

  /** [[logOddsKeyness]] with the (group, token) counts and token
    * totals persisted (they feed the totals, the globals, and the
    * scored join) and handed back for release — the form the bench
    * queries run. The plain form is unhinted: leak-free, re-tokenizing
    * the corpus up to three times.
    */
  def logOddsKeynessCached(df: org.apache.spark.sql.DataFrame,
                           groupCol: String, textCol: String,
                           k: Int = 5): Cached =
    logOddsKeynessImpl(df, groupCol, textCol, k, persist = true)

  private def logOddsKeynessImpl(df: org.apache.spark.sql.DataFrame,
                                 groupCol: String, textCol: String,
                                 k: Int, persist: Boolean): Cached = {
    val alpha = 0.5
    val pinned =
      scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.DataFrame]
    def pin(d: org.apache.spark.sql.DataFrame) =
      if (persist) {
        val p = d.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pinned += p; p
      } else d
    val grpTok = pin(df
      .filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).as("grp"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("y")))
    val tokTot = pin(grpTok.groupBy(col("token"))
      .agg(sum(col("y")).as("y_all")))
    val grpTot = grpTok.groupBy(col("grp")).agg(sum(col("y")).as("n_i"))
    val global = tokTot.agg(count(lit(1)).as("v_sz"),
      sum(col("y_all")).as("n_all"))
    val scored = grpTok
      .join(tokTot, Seq("token"))
      .join(grpTot, Seq("grp"))
      .crossJoin(broadcast(global))
      .withColumn("__yr", col("y_all") - col("y"))
      .withColumn("__nr", col("n_all") - col("n_i"))
      .withColumn("__va", col("v_sz").cast("double") * alpha)
      .withColumn("__delta",
        log((col("y").cast("double") + alpha) /
          (col("n_i").cast("double") + col("__va") -
            col("y").cast("double") - alpha)) -
          log((col("__yr").cast("double") + alpha) /
            (col("__nr").cast("double") + col("__va") -
              col("__yr").cast("double") - alpha)))
      .withColumn("__sig2",
        lit(1.0) / (col("y").cast("double") + alpha) +
          lit(1.0) / (col("__yr").cast("double") + alpha))
      .withColumn("z", round(col("__delta") / sqrt(col("__sig2")), 7))
    // one window ranks AND filters — a topKPerGroup pass would compute
    // the identical row_number, drop it, and force a second window to
    // re-derive the rank the output needs
    val out = scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("z").desc, col("token").asc)))
      .filter(col("rank") <= k)
      .select(col("grp"), col("token"), col("y"), col("z"), col("rank"))
    Cached(out, pinned.toSeq)
  }
}
