package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Text-analysis coverage over the documents table: token stats, quality
  * bucketing, language ID, fingerprinting. Oracles restate each formula
  * in DuckDB; scores are compared via integer bucket counts (floor of
  * identically-computed doubles), which sidesteps sum-order effects.
  */
object TextQueries extends QuerySet {

  /** The pinned merge table shared by t16b's Spark query and its DuckDB
    * oracle (high-frequency English bigrams; order is the priority).
    */
  val pinnedMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r",
    "o" -> "n", "r" -> "e", "an" -> "d", "o" -> "r", "e" -> "n")

  private val enStop = TextAnalysis.langStopwords("en")

  /** Shared input for the packing queries: whitespace token counts
    * per non-empty document.
    */
  private def docTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull && col("doc_id").isNotNull &&
        length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ntok"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Training-sequence packing, concat-and-chunk discipline (the
    // GPT-pretraining default): documents concatenate per shard in
    // doc_id order, the token stream cuts every 512 tokens; per-shard
    // doc/token/bin counts plus how many documents straddle a cut —
    // the capacity-tuning signal. One windowed prefix sum per shard,
    // every output integer, hash-exact.
    "t29_chunk_pack" -> ((s, d) =>
      graft.ops.Packing.chunkPackStats(docTokens(s, d), "doc_id",
          "ntok", capacity = 512L, nShards = 8)
        .orderBy(col("shard"))),

    // Training-sequence packing, document-boundary next-fit (the
    // no-cross-doc-attention discipline): bins fill in doc_id order
    // and close on overflow; per-shard bin count, open-bin fill,
    // oversize count, and the integer-ppm packing efficiency the
    // capacity choice is tuned on. The (bins, fill) two-cell fold is
    // replayed exactly by the oracle's list_reduce.
    "t30_nextfit_pack" -> ((s, d) =>
      graft.ops.Packing.nextFitStats(docTokens(s, d), "doc_id",
          "ntok", capacity = 512L, nShards = 8)
        .orderBy(col("shard"))),

    // Unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece
    // model; r12 mandate #5) — Viterbi-EM over the corpus vocabulary:
    // candidate substrings seed, two EM rounds re-segment every
    // distinct word under the current integer log-prob scores and
    // re-estimate from piece counts. ln() keeps this rows-only (the
    // BPE-training t16 stance); t33 is the hash-exact portable twin
    // (fixed-vocab Viterbi IS DuckDB-expressible), UnigramSpec pins a
    // hand-derived EM round.
    "t32_unigram_train" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(explode(split(trim(lower(col("text"))), "\\s+"))
          .as("word"))
        .filter(col("word").rlike("^[a-z]{1,20}$"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      graft.ops.Unigram.trainUnigram(words, "word", "freq",
          vocabSize = 24, emIters = 2)
        .orderBy(col("cnt").desc, col("piece"))
    }),

    // Viterbi segmentation under a FIXED unigram vocabulary (t32's
    // portable twin): the max-score split of every corpus word under
    // literal integer piece scores — the DP is a codegen'd fold over
    // character positions, the walk-back a second fold, all integer/
    // string algebra; the oracle replays the DP as the same flat-
    // array list_reduce and walks back with a recursive CTE.
    "t33_unigram_segment" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(explode(split(trim(lower(col("text"))), "\\s+"))
          .as("word"))
        .filter(col("word").rlike("^[a-z]{1,20}$"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
      graft.ops.Unigram.segmentWords(words, "word",
          unigramVocab, charFallback = UnigramFallback)
        .select(col("word"), col("n"), col("n_pieces"),
          col("score_fp"), col("seg"))
        .orderBy(col("word"))
    }),

    // Training-sequence packing, first-fit-decreasing (the waste-
    // minimizing no-straddle discipline production batch-builders use;
    // 11/9-OPT where next-fit promises only 2-OPT): docs sort by
    // length desc within the shard, each lands in the FIRST open bin
    // that fits. The open-bin fill VECTOR is the fold state; the
    // oracle replays the identical fold as a list_reduce over fill
    // lists. eff_ppm vs t30's on the same corpus is the discipline-
    // selection signal the capacity choice is tuned on.
    "t31_ffd_pack" -> ((s, d) =>
      graft.ops.Packing.ffdStats(docTokens(s, d), "doc_id",
          "ntok", capacity = 512L, nShards = 8)
        .orderBy(col("shard"))),

    // Distinctive terms per source ("Fightin' Words" log-odds with a
    // flat Dirichlet prior, z-scored): what each slice of the corpus
    // over-represents vs the rest. z is 7dp-rounded before the per-
    // group top-5 ranking so ln ulp drift cannot flip an ordering.
    "t25_log_odds_keyness" -> ((s, d) =>
      graft.ops.TextAnalysis.logOddsKeynessCached(
        Tables.documents(s, d).select(col("source"), col("text")),
        "source", "text", k = 5)
        .df.withColumn("rank", col("rank").cast("long"))
        .orderBy(col("grp"), col("rank"))),

    // Per-doc n-gram novelty: fraction of the doc's distinct 3-shingles
    // first owned (min doc_id corpus-wide) by the doc itself — the
    // "new text vs recombination" mixing signal. Min-id ownership is
    // hash-free, so the whole pipeline is oracle-exact.
    "t27_ngram_novelty" -> ((s, d) =>
      graft.ops.Dedup.ngramNovelty(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "text", "doc_id", n = 3)
        .orderBy(col("doc_id"))),

    // Corpus-diversity screen per source: Shannon entropy of the
    // token distribution, type-token ratio, normalized entropy —
    // template spam collapses all three.
    "t26_token_entropy" -> ((s, d) =>
      graft.ops.TextAnalysis.tokenEntropy(
        Tables.documents(s, d).select(col("source"), col("text")),
        "source", "text")
        .orderBy(col("grp"))),

    // Spell correction / OCR cleanup: plant a deterministic typo (last
    // char → '~' on every 5th (doc_id+pos) token of length ≥ 4), then
    // recover it against the corpus's own vocabulary via the blocked
    // levenshtein join. Shape: corrections run over DISTINCT OOV terms
    // (bounded by vocabulary size, not corpus size) with the dictionary
    // broadcast twice — the exploded corpus is never shuffled.
    "t20_spell_correct" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
      val dirty = toks.withColumn("tok",
        when((col("doc_id") + col("pos")) % 5 === 0 &&
            length(col("tok")) >= 4,
          concat(expr("substring(tok, 1, length(tok) - 1)"), lit("~")))
          .otherwise(col("tok")))
      val vocab = toks.select(col("tok")).distinct()
      val oov = dirty.join(vocab.withColumnRenamed("tok", "__v"),
        col("tok") === col("__v"), "left_anti")
      val corr = graft.ops.FuzzyJoin.corrections(
        oov.select(col("tok")), "tok", vocab, "tok", maxDist = 1)
      oov.join(broadcast(corr), col("tok") === col("term"))
        .groupBy(col("term").as("dirty"), col("corrected"), col("dist"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast("long").as("doc_checksum"))
        .orderBy(col("dirty"))
    }),

    // Token counting (whitespace + BPE-ish regex) per language.
    "t01_token_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).as("toks"),
          TextAnalysis.subwordCount(col("text")).as("subs"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("toks")).as("sum_tokens"),
          sum(col("subs")).as("sum_subwords"),
          max(col("toks")).as("max_tokens"))
        .orderBy(col("lang"))),

    // Percentile-band length filter — the corpus-curation trim of the
    // too-short/too-long tails. Bounds come from one EXACT interpolated
    // percentile pass over integer token counts (Spark `percentile` ≡
    // DuckDB `quantile_cont`, R-7 interpolation) and broadcast into the
    // filter; `TextAnalysis.lengthBand(approx = true)` is the one-pass
    // sketch path for 100-TB corpora (contract pinned in its spec).
    // Winnowing resemblance: each doc vs its planted first-word-dropped
    // copy — shared local fingerprints over the union (Jaccard on the
    // winnow sets). md5 selection is engine-portable → fully
    // oracle-checked; the division is exact-integer/exact-integer so
    // only the avg needs rounding.
    "t13_winnow_fp" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val fp = graft.ops.Layout.fanOut(docs).select(col("doc_id"),
        TextAnalysis.winnowFingerprints(col("text"), k = 3, w = 4)
          .as("fp"))
      val mutated = docs
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
      val fpm = graft.ops.Layout.fanOut(mutated).select(
        (col("doc_id") - 1000000).as("doc_id"),
        TextAnalysis.winnowFingerprints(col("text"), k = 3, w = 4)
          .as("fpm"))
      val res = fp.join(fpm, "doc_id")
        .withColumn("inter", size(array_intersect(col("fp"), col("fpm"))))
        .withColumn("uni",
          size(col("fp")) + size(col("fpm")) - col("inter"))
        .withColumn("resemblance",
          col("inter").cast("double") / col("uni"))
      res.agg(count(lit(1)).as("n_pairs"),
        sum(col("inter")).as("sum_shared"),
        sum(when(col("resemblance") >= 0.5, 1L).otherwise(0L))
          .as("n_high"),
        org.apache.spark.sql.functions.round(avg(col("resemblance")), 6)
          .as("avg_resemblance"))
    }),

    // BPE tokenizer-training step: corpus → distinct-word frequencies →
    // adjacent symbol-pair counts (chars + </w> marker). Top-30 merge
    // candidates; all-integer counts → hash-exact oracle.
    "t15_bpe_pairs" -> ((s, d) =>
      TextAnalysis.bpePairCounts(Tables.documents(s, d), "text")
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(30)),

    // Text normalization: docs get planted control chars, zero-width
    // junk, and whitespace runs (doc_id mod 4); cleaning must strip
    // them back to the original text. Integer length sums → hash-exact.
    "t17_normalize" -> ((s, d) => {
      val dirty = Tables.documents(s, d).withColumn("dirty",
        when(col("doc_id") % 4 === 1,
          concat(lit("  "), col("text"), lit("  \r\n")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("​﻿"), col("text"), lit("‌‍")))
          .when(col("doc_id") % 4 === 3,
            regexp_replace(col("text"), " ", "   "))
          .otherwise(col("text")))
      dirty.select(col("source"),
          TextAnalysis.normalizeText(col("dirty")).as("clean"),
          col("text"), col("dirty"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("dirty"))).as("dirty_len"),
          sum(length(col("clean"))).as("clean_len"),
          sum(when(col("clean") === col("text"), 1L).otherwise(0L))
            .as("n_restored"))
        .orderBy(col("source"))
    }),

    // Unicode script profile: the ASCII corpus gets script-specific
    // suffixes planted (doc_id mod 5: Cyrillic / CJK / Arabic /
    // digits) and the per-lang script counts must pick them up
    // exactly. Integer char counts → hash-exact.
    "t18_script_profile" -> ((s, d) => {
      val planted = Tables.documents(s, d).withColumn("text",
        when(col("doc_id") % 5 === 1, concat(col("text"), lit(" привет мир")))
          .when(col("doc_id") % 5 === 2, concat(col("text"), lit(" 中文文本")))
          .when(col("doc_id") % 5 === 3, concat(col("text"), lit(" مرحبا")))
          .when(col("doc_id") % 5 === 4, concat(col("text"), lit(" 12345")))
          .otherwise(col("text")))
      planted.select(col("lang"),
          TextAnalysis.scriptCounts(col("text")).as("sc"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("sc.latin")).as("latin"),
          sum(col("sc.cyrillic")).as("cyrillic"),
          sum(col("sc.cjk")).as("cjk"),
          sum(col("sc.arabic")).as("arabic"),
          sum(col("sc.digit")).as("digits"),
          sum(col("sc.total")).as("total"))
        .orderBy(col("lang"))
    }),

    // End-to-end BPE: train 10 merge rules on the corpus (driver loop
    // over the distributed vocab count), tokenize every word with them
    // (pure column-expression fold), report per-lang compression.
    // Iterative training isn't SQL-expressible → rows-only; the merge
    // sequence and application are pinned by the canonical-example
    // spec in PipelineOpsSpec.
    "t16_bpe_tokenize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = TextAnalysis.bpeTrainMerges(docs, "text", numMerges = 10)
      // merge application runs once per DISTINCT (lang, word) — the
      // fold over the symbol array is the expensive kernel, and words
      // repeat heavily, so the corpus collapses to its vocabulary
      // before paying it (same shape as bpePairCounts' two passes)
      docs
        .select(col("lang"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("freq"))
        .select(col("lang"), col("freq"),
          size(TextAnalysis.bpeApplyMerges(col("w"), merges)).as("n_sym"),
          (length(col("w")) + 1).as("n_char_sym"))
        .groupBy(col("lang"))
        .agg(sum(col("freq")).as("n_words"),
          sum(col("n_sym") * col("freq")).as("sym_sum"),
          sum(col("n_char_sym") * col("freq")).as("unmerged_sum"))
        .orderBy(col("lang"))
    }),

    // Hash-gated twin of t16's merge-APPLICATION kernel (the scale-path
    // half; iterative training stays spec-gated): a pinned 10-rule
    // merge table, every distinct word tokenized by the same greedy
    // fold, per-lang compression stats. The DuckDB oracle replays the
    // fold exactly — a recursive CTE merging the LEFTMOST (l,r) pair
    // repeatedly, which is equivalent to the single greedy sweep
    // because a merge of rule (l,r) can never create a new (l,r)
    // adjacency (lr ≠ l and lr ≠ r by length).
    "t16b_bpe_tokenize_portable" -> ((s, d) => {
      val merges = TextQueries.pinnedMerges
      Tables.documents(s, d)
        .select(col("lang"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("freq"))
        .select(col("lang"), col("freq"),
          size(TextAnalysis.bpeApplyMerges(col("w"), merges)).as("n_sym"),
          (length(col("w")) + 1).as("n_char_sym"))
        .groupBy(col("lang"))
        .agg(sum(col("freq")).as("n_words"),
          sum(col("n_sym") * col("freq")).as("sym_sum"),
          sum(col("n_char_sym") * col("freq")).as("unmerged_sum"))
        .orderBy(col("lang"))
    }),

    // Gopher rule battery: per-source rule-failure profile. Every rule
    // is an integer comparison (no float division) → hash-exact oracle.
    // A third of docs get adversarial mutations planted (doc_id mod 3:
    // 1 → '# # ...' symbol spam, 2 → numeric tokens) so each rule
    // actually fires on the synthetic corpus.
    "t14_gopher_rules" -> ((s, d) => {
      val dirty = Tables.documents(s, d).withColumn("text",
        when(col("doc_id") % 3 === 1,
          concat(col("text"), lit(" # # # ... # ... # # ... #")))
          .when(col("doc_id") % 3 === 2,
            concat(lit("12345 67890 11111 22222 33333 44444 55555 "),
              col("text")))
          .otherwise(col("text")))
      val r = dirty.select(col("source"),
        TextAnalysis.gopherRules(col("text"), enStop, minWords = 30)
          .as("g"))
      r.groupBy(col("source")).agg(count(lit(1)).as("n"),
        sum(when(!col("g.words_ok"), 1L).otherwise(0L)).as("f_words"),
        sum(when(!col("g.mean_len_ok"), 1L).otherwise(0L)).as("f_meanlen"),
        sum(when(!col("g.symbol_ok"), 1L).otherwise(0L)).as("f_symbol"),
        sum(when(!col("g.alpha_ok"), 1L).otherwise(0L)).as("f_alpha"),
        sum(when(!col("g.stopword_ok"), 1L).otherwise(0L)).as("f_stop"),
        sum(when(col("g.pass"), 1L).otherwise(0L)).as("n_pass"))
        .orderBy(col("source"))
    }),

    // CCNet-style LM quality banding: self-score the corpus with an
    // add-1 word-bigram model, band docs by integer surprisal. ln() is
    // transcendental (±1 ulp cross-engine) but the band boundaries are
    // integers ~12 orders of magnitude away — banding absorbs it; the
    // per-lang mean is rounded to 6dp for the same reason.
    "t12_lm_surprisal" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      graft.ops.LanguageModel
        .bigramSurprisal(docs, docs, "text", "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(col("lang"),
          floor(col("surprisal")).cast("long").as("band"))
        .agg(count(lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.round(avg(col("surprisal")), 6)
            .as("mean_surprisal"))
        .orderBy(col("lang"), col("band"))
    }),

    // Concat-and-chunk packing into 512-token training sequences: every
    // document's (seq_id, offset) assignment, summarized per sequence.
    // The prefix sum is the parallel bucketed plan (no global window).
    "t11_seq_pack" -> ((s, d) =>
      TextAnalysis.packSequences(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text",
        budget = 512)
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("doc_id")).as("first_doc"),
          min(col("seq_offset")).as("first_offset"))
        .orderBy(col("seq_id"))),

    // Pareto-frontier curation: the documents not dominated on the
    // (chars, distinct tokens, longest token) triple — "best in at
    // least one trade-off direction", the multi-criteria keep-rule a
    // curation pass applies where a single quality score would
    // collapse the trade-off. Integer metrics end to end, so the
    // NOT-EXISTS oracle is exact; the engine runs the two-pass
    // pivot-prune + bounded broadcast exact check (ops/Skyline.scala),
    // not the oracle's all-pairs scan.
    "c03_pareto_docs" -> ((s, d) => {
      val toks = split(trim(lower(col("text"))), "\\s+")
      val m = Tables.documents(s, d)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("len"),
          size(array_distinct(toks)).cast("long").as("dtok"),
          array_max(transform(toks, t => length(t))).cast("long")
            .as("wmax"))
      graft.ops.Skyline.skyline(m, "doc_id", Seq("len", "dtok", "wmax"))
        .orderBy(col("doc_id"))
    }),

    // End-to-end curation funnel — the composed pipeline a training-data
    // job actually runs, with per-stage survivor counts: exact dedup
    // (keep min-id per text) → Gopher quality battery → percentile
    // length band over the SURVIVORS. Every stage is engine-portable,
    // so the whole funnel (including the survivor-dependent percentile
    // bounds) is one oracle row set.
    "c01_curation_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val deduped = docs.join(
        docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id"), Seq("doc_id"), "left_semi")
      val gophered = deduped.filter(
        TextAnalysis.gopherRules(col("text"), enStop, minWords = 30)
          .getField("pass"))
      val banded = TextAnalysis.lengthBand(gophered, "text", 0.05, 0.95)
      def stage(name: String, df0: DataFrame) =
        df0.agg(count(lit(1)).as("n_docs"))
          .select(lit(name).as("stage"), col("n_docs"))
      stage("1_raw", docs)
        .unionByName(stage("2_exact_dedup", deduped))
        .unionByName(stage("3_gopher", gophered))
        .unionByName(stage("4_length_band", banded))
        .orderBy(col("stage"))
    }),

    "t08_length_band" -> ((s, d) =>
      TextAnalysis.lengthBand(
        Tables.documents(s, d).select(col("lang"), col("text")), "text",
        pLo = 0.05, pHi = 0.95)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("sum_tokens"))
        .orderBy(col("lang"))),

    // Quality scoring: identical double formula both sides → identical
    // floor buckets; counted per (lang, decile).
    "t02_quality_buckets" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          floor(TextAnalysis.qualityScore(col("text"), enStop) * 10)
            .cast("int").as("bucket"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("bucket"))),

    // Language-ID heuristic distribution vs the labeled lang column.
    "t03_langid" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))),

    // Context-window chunking: 50-token chunks, 10-token overlap; chunk
    // counts + boundary token sums per lang (all integers → exact).
    "t06_chunking" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("chunk",
          explode(TextAnalysis.chunkTokens(col("text"), 50, 10)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(TextAnalysis.tokenCount(col("chunk"))).as("sum_chunk_tokens"),
          max(TextAnalysis.tokenCount(col("chunk"))).as("max_chunk_tokens"))
        .orderBy(col("lang"))),

    // Repetition-ratio quality filter: deciles of 1 − distinct/total
    // 2-grams (identical float formula → identical floor buckets).
    "t07_repetition" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          floor(TextAnalysis.repetitionRatio(col("text"), 2) * 10)
            .cast("int").as("bucket"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("bucket"))),

    // PII redaction: plant an email + phone in every doc, redact, count
    // placeholders and verify no residue.
    "t05_pii_redaction" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("dirty",
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or +1202555"),
            lpad(col("doc_id") % 10000, 4, "0")))
        .withColumn("cleaned", TextAnalysis.redactPii(col("dirty")))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("cleaned").contains("[EMAIL]"), 1L).otherwise(0L))
            .as("n_email_redacted"),
          sum(when(col("cleaned").contains("[PHONE]"), 1L).otherwise(0L))
            .as("n_phone_redacted"),
          sum(when(col("cleaned").rlike("@example\\.com"), 1L).otherwise(0L))
            .as("n_email_residue"))),

    // Content fingerprint: distinct count + min digest pins sha256 parity.
    "t04_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("fp")).as("n_distinct"),
          min(col("fp")).as("min_fp"))
        .orderBy(col("lang")))
  )

  /** t33's fixed vocabulary: subword pieces of the corpus's database-
    * vocabulary words with integer fixed-point scores (micro-nat
    * scale; more negative = rarer). Shared by the Spark CASE chain
    * and the oracle replay so both engines score identically.
    */
  private[queries] val unigramVocab: Seq[(String, Long)] = Seq(
    "jo" -> -900L, "in" -> -700L, "ha" -> -800L, "sh" -> -850L,
    "ro" -> -950L, "ba" -> -800L, "tch" -> -950L, "sc" -> -900L,
    "an" -> -700L, "col" -> -850L, "umn" -> -950L, "cust" -> -900L,
    "omer" -> -950L, "fil" -> -900L, "ter" -> -750L, "sma" -> -950L,
    "ll" -> -800L, "mer" -> -850L, "ge" -> -800L, "ta" -> -800L,
    "ble" -> -900L, "val" -> -850L, "ue" -> -800L, "st" -> -750L,
    "rea" -> -900L, "am" -> -800L, "win" -> -900L, "dow" -> -900L,
    "spa" -> -900L, "rk" -> -850L, "gro" -> -900L, "up" -> -750L,
    "par" -> -850L, "big" -> -800L, "agg" -> -800L, "key" -> -800L)

  private[queries] val UnigramFallback = -1500L

  private val toksSql = """string_split_regex(trim(text), '\s+')"""
  private val ltoksSql = """string_split_regex(trim(lower(text)), '\s+')"""
  private def hitsSql(words: Seq[String]): String =
    s"len(list_filter($ltoksSql, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  /** Shared by batch t29 and streaming st32 (the offset fold is
    * bit-equal to the batch prefix sum by construction): replay
    * chunk packing — shard = id % 8, windowed prefix sum in id
    * order, bin boundaries by integer division at capacity 512.
    */
  private[queries] val chunkPackOracleSql: String =
    """WITH d AS (SELECT doc_id AS id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS tok
             FROM documents
             WHERE text IS NOT NULL AND doc_id IS NOT NULL
               AND len(trim(text)) > 0),
         s AS (SELECT id, tok, id % 8 AS shard FROM d),
         c AS (SELECT shard, id, tok,
                 SUM(tok) OVER (PARTITION BY shard ORDER BY id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - tok AS strt
               FROM s)
         SELECT shard, COUNT(*) AS n_docs,
                CAST(SUM(tok) AS BIGINT) AS n_tokens,
                CAST((SUM(tok) + 511) // 512 AS BIGINT) AS n_bins,
                CAST(SUM(CASE WHEN strt // 512
                               <> (strt + tok - 1) // 512
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_straddling
         FROM c GROUP BY shard ORDER BY shard"""

  /** Shared by batch t30 and streaming st33 (the open-bin two-long
    * state is the fold cells carried across batches): replay next-fit
    * packing — the (bins, fill) two-cell fold as list_reduce over the
    * id-ordered token list (the first lifted pair IS the seed), every
    * step BIGINT.
    */
  private[queries] val nextFitOracleSql: String =
    """WITH d AS (SELECT doc_id AS id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS tok
             FROM documents
             WHERE text IS NOT NULL AND doc_id IS NOT NULL
               AND len(trim(text)) > 0),
         s AS (SELECT id, tok, id % 8 AS shard FROM d),
         g AS (SELECT shard, COUNT(*) AS n_docs,
                 CAST(SUM(tok) AS BIGINT) AS n_tokens,
                 CAST(SUM(CASE WHEN tok > 512 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_oversize,
                 list(tok ORDER BY id) AS toks
               FROM s GROUP BY shard),
         f AS (SELECT shard, n_docs, n_tokens, n_oversize,
                 list_reduce(
                   list_transform(toks, t -> [CAST(1 AS BIGINT), t]),
                   (acc, x) -> CASE WHEN acc[2] + x[2] <= 512
                     THEN [acc[1], acc[2] + x[2]]
                     ELSE [acc[1] + 1, x[2]] END) AS st
               FROM g)
         SELECT shard, n_docs, n_tokens,
                st[1] AS n_bins, st[2] AS last_fill, n_oversize,
                CAST(n_tokens * 1000000 // (st[1] * 512) AS BIGINT)
                  AS eff_ppm
         FROM f ORDER BY shard"""

  /** t33's replay: the same flat-array Viterbi fold (DuckDB 1.0
    * miscompiles struct-typed reduce ACCUMULATORS, so the dp stays a
    * flat BIGINT list exactly like the Spark fold), back-pointers
    * extracted by a plain transform, and the walk-back as a
    * recursive CTE — pos strictly decreases to 0, one terminal row
    * per word.
    */
  private def unigramSegmentOracle: String = {
    val cases = unigramVocab
      .map { case (p, s) => s"WHEN '$p' THEN $s" }.mkString(" ")
    val piece = "substr(word, CAST(j AS INT) + 1, CAST(x[1] - j AS INT))"
    val score = s"CASE $piece $cases ELSE CASE WHEN " +
      s"length($piece) = 1 THEN $UnigramFallback " +
      "ELSE -1000000000000 END END"
    s"""WITH RECURSIVE words AS (
           SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT unnest(string_split_regex(trim(lower(text)),
                   '\\s+')) AS t
                 FROM documents WHERE text IS NOT NULL)
           WHERE regexp_matches(t, '^[a-z]{1,20}$$') GROUP BY t),
         d AS MATERIALIZED (SELECT word, n,
           list_reduce(
             list_prepend([CAST(0 AS BIGINT), CAST(-1 AS BIGINT)],
               list_transform(range(1, length(word) + 1), i -> [i])),
             (acc, x) -> list_concat(acc, flatten(list_transform(
               [list_aggregate(list_transform(
                  range(greatest(x[1] - 4, 0), x[1]),
                  j -> {'s': acc[CAST(2*j AS INT) + 1] + ($score),
                        'nj': -j}), 'max')],
               b -> [b.s, -b.nj])))) AS dp
           FROM words),
         b AS MATERIALIZED (SELECT word, n,
           dp[2*length(word) + 1] AS score_fp,
           list_transform(range(1, length(word) + 1),
             p -> dp[CAST(2*p AS INT) + 2]) AS backs
           FROM d),
         walk AS (
           SELECT word, CAST(length(word) AS BIGINT) AS pos,
                  '' AS seg, CAST(0 AS BIGINT) AS np FROM b
           UNION ALL
           SELECT w.word, b.backs[CAST(w.pos AS INT)],
                  substr(w.word,
                    CAST(b.backs[CAST(w.pos AS INT)] AS INT) + 1,
                    CAST(w.pos - b.backs[CAST(w.pos AS INT)] AS INT))
                  || (CASE WHEN w.np > 0 THEN '|' ELSE '' END) || w.seg,
                  w.np + 1
           FROM walk w JOIN b ON w.word = b.word WHERE w.pos > 0)
         SELECT b.word, b.n, wk.np AS n_pieces,
                CAST(b.score_fp AS BIGINT) AS score_fp, wk.seg
         FROM b JOIN walk wk ON b.word = wk.word AND wk.pos = 0
         ORDER BY b.word"""
  }

  def oracle: Map[String, String] = Map(
    "t29_chunk_pack" -> chunkPackOracleSql,

    "t33_unigram_segment" -> unigramSegmentOracle,

    "t30_nextfit_pack" -> nextFitOracleSql,

    // replay first-fit-decreasing: the fold accumulator IS the
    // open-bin fill list (seeded by the largest doc), docs in
    // (tok DESC, id ASC) order; the first-fit index is the head of a
    // filtered 1-based range, inlined twice (no lets in lambdas —
    // the same stance as the Spark fold's expression)
    "t31_ffd_pack" ->
      """WITH d AS (SELECT doc_id AS id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS tok
             FROM documents
             WHERE text IS NOT NULL AND doc_id IS NOT NULL
               AND len(trim(text)) > 0),
         s AS (SELECT id, tok, id % 8 AS shard FROM d),
         g AS (SELECT shard, COUNT(*) AS n_docs,
                 CAST(SUM(tok) AS BIGINT) AS n_tokens,
                 CAST(SUM(CASE WHEN tok > 512 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_oversize,
                 list(tok ORDER BY tok DESC, id) AS toks
               FROM s GROUP BY shard),
         f AS (SELECT shard, n_docs, n_tokens, n_oversize,
                 list_reduce(
                   list_transform(toks, t -> [t]),
                   (acc, x) -> CASE
                     WHEN list_filter(range(1, len(acc) + 1),
                            i -> acc[i] + x[1] <= 512)[1] IS NULL
                     THEN list_append(acc, x[1])
                     ELSE list_transform(range(1, len(acc) + 1),
                            j -> CASE WHEN j =
                                   list_filter(range(1, len(acc) + 1),
                                     i -> acc[i] + x[1] <= 512)[1]
                                 THEN acc[j] + x[1] ELSE acc[j] END)
                   END) AS fills
               FROM g)
         SELECT shard, n_docs, n_tokens, n_oversize,
                CAST(len(fills) AS BIGINT) AS n_bins,
                CAST(list_min(fills) AS BIGINT) AS min_fill,
                CAST(list_max(fills) AS BIGINT) AS max_fill,
                CAST(n_tokens * 1000000 // (len(fills) * 512)
                  AS BIGINT) AS eff_ppm
         FROM f ORDER BY shard""",

    "t27_ngram_novelty" ->
      """WITH t AS (SELECT doc_id,
                    string_split_regex(trim(lower(text)), '\s+') AS toks
                    FROM documents
                    WHERE text IS NOT NULL AND doc_id IS NOT NULL),
         s AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(toks) < 3
                   THEN [list_aggregate(toks, 'string_agg', ' ')]
                   ELSE list_transform(range(0, len(toks) - 2),
                          i -> list_aggregate(toks[i+1:i+3],
                                              'string_agg', ' '))
                 END) AS sh
               FROM t),
         ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
         fo AS (SELECT g, min(doc_id) AS first_id FROM ex GROUP BY g),
         pd AS (SELECT e.doc_id, COUNT(*) AS n_sh,
                  SUM(CASE WHEN f.first_id = e.doc_id THEN 1 ELSE 0 END)
                    AS n_first
                FROM ex e JOIN fo f ON e.g = f.g GROUP BY e.doc_id)
         SELECT doc_id, CAST(n_sh AS BIGINT) AS n_sh,
                CAST(n_first AS BIGINT) AS n_first,
                round(CAST(n_first AS DOUBLE) / CAST(n_sh AS DOUBLE), 7)
                  AS novelty
         FROM pd ORDER BY doc_id""",

    "t26_token_entropy" ->
      """WITH gt AS (SELECT grp, tok AS token, COUNT(*) AS y
                     FROM (SELECT source AS grp,
                             unnest(string_split_regex(
                               trim(lower(text)), '\s+')) AS tok
                           FROM documents
                           WHERE source IS NOT NULL
                             AND text IS NOT NULL)
                     WHERE tok <> '' GROUP BY grp, tok),
         tt AS (SELECT grp, SUM(y) AS n, COUNT(*) AS v
                FROM gt GROUP BY grp),
         h AS (SELECT gt.grp, tt.n, tt.v,
                 CAST(round(-((CAST(y AS DOUBLE) / CAST(n AS DOUBLE))
                              * ln(CAST(y AS DOUBLE)
                                   / CAST(n AS DOUBLE))), 9)
                      AS DECIMAL(38,9)) AS hh
               FROM gt JOIN tt ON gt.grp = tt.grp),
         e AS (SELECT grp, n, v, CAST(SUM(hh) AS DOUBLE) AS hsum
               FROM h GROUP BY grp, n, v)
         SELECT grp, CAST(n AS BIGINT) AS n_tokens, v AS n_types,
                round(CAST(v AS DOUBLE) / CAST(n AS DOUBLE), 7) AS ttr,
                hsum AS entropy,
                CASE WHEN v > 1 THEN
                  round(hsum / ln(CAST(v AS DOUBLE)), 7)
                END AS norm_entropy
         FROM e ORDER BY grp""",
    "t25_log_odds_keyness" ->
      """WITH gt AS (SELECT grp, tok AS token, COUNT(*) AS y
                     FROM (SELECT source AS grp,
                             unnest(string_split_regex(
                               trim(lower(text)), '\s+')) AS tok
                           FROM documents
                           WHERE source IS NOT NULL
                             AND text IS NOT NULL)
                     WHERE tok <> '' GROUP BY grp, tok),
         tt AS (SELECT token, SUM(y) AS y_all FROM gt GROUP BY token),
         gg AS (SELECT grp, SUM(y) AS n_i FROM gt GROUP BY grp),
         gl AS (SELECT COUNT(*) AS v_sz, SUM(y_all) AS n_all FROM tt),
         sc AS (SELECT gt.grp, gt.token, gt.y,
                  tt.y_all - gt.y AS yr, gl.n_all - gg.n_i AS nr,
                  CAST(gl.v_sz AS DOUBLE) * 0.5 AS va, gg.n_i
                FROM gt JOIN tt USING (token) JOIN gg USING (grp), gl),
         z AS (SELECT grp, token, y,
                 round((ln((CAST(y AS DOUBLE) + 0.5)
                         / (CAST(n_i AS DOUBLE) + va
                            - CAST(y AS DOUBLE) - 0.5))
                      - ln((CAST(yr AS DOUBLE) + 0.5)
                         / (CAST(nr AS DOUBLE) + va
                            - CAST(yr AS DOUBLE) - 0.5)))
                     / sqrt(1.0 / (CAST(y AS DOUBLE) + 0.5)
                          + 1.0 / (CAST(yr AS DOUBLE) + 0.5)), 7) AS z
               FROM sc),
         r AS (SELECT grp, token, y, z,
                 ROW_NUMBER() OVER (PARTITION BY grp
                                    ORDER BY z DESC, token) AS rank
               FROM z)
         SELECT grp, token, CAST(y AS BIGINT) AS y, z,
                CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY grp, rank""",
    "t20_spell_correct" ->
      """WITH t AS (SELECT doc_id,
                      string_split_regex(trim(text), '\s+') AS toks
                    FROM documents),
           tok AS (SELECT doc_id, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) - 1 AS pos
                   FROM t),
           dirty AS (SELECT doc_id,
                       CASE WHEN (doc_id + pos) % 5 = 0 AND len(tok) >= 4
                            THEN substring(tok, 1, len(tok) - 1) || '~'
                            ELSE tok END AS tok
                     FROM tok),
           vocab AS (SELECT DISTINCT tok FROM tok),
           oov AS (SELECT d.* FROM dirty d
                   WHERE d.tok NOT IN (SELECT tok FROM vocab)),
           cand AS (SELECT o.term, v.tok AS cand,
                      levenshtein(o.term, v.tok) AS dist
                    FROM (SELECT DISTINCT tok AS term FROM oov) o
                    JOIN vocab v
                      ON substring(o.term, 1, 1) = substring(v.tok, 1, 1)
                     AND abs(len(o.term) - len(v.tok)) <= 1
                     AND levenshtein(o.term, v.tok) <= 1),
           best AS (SELECT term, cand AS corrected,
                      CAST(dist AS BIGINT) AS dist,
                      ROW_NUMBER() OVER (PARTITION BY term
                                         ORDER BY dist, cand) AS rn
                    FROM cand)
         SELECT o.tok AS dirty, b.corrected, b.dist,
                COUNT(*) AS n,
                CAST(SUM(o.doc_id) AS BIGINT) AS doc_checksum
         FROM oov o JOIN best b ON o.tok = b.term AND b.rn = 1
         GROUP BY 1, 2, 3 ORDER BY 1""",
    "t18_script_profile" ->
      """WITH planted AS (
           SELECT lang,
             CASE WHEN doc_id % 5 = 1 THEN text || ' привет мир'
                  WHEN doc_id % 5 = 2 THEN text || ' 中文文本'
                  WHEN doc_id % 5 = 3 THEN text || ' مرحبا'
                  WHEN doc_id % 5 = 4 THEN text || ' 12345'
                  ELSE text END AS text
           FROM documents),
         c AS (SELECT lang, length(text) AS total,
                 length(text) - length(regexp_replace(text,
                   '[A-Za-z\x{00c0}-\x{024f}]', '', 'g')) AS latin,
                 length(text) - length(regexp_replace(text,
                   '[\x{0400}-\x{04ff}]', '', 'g')) AS cyrillic,
                 length(text) - length(regexp_replace(text,
                   '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
                 length(text) - length(regexp_replace(text,
                   '[\x{0600}-\x{06ff}]', '', 'g')) AS arabic,
                 length(text) - length(regexp_replace(text,
                   '[0-9]', '', 'g')) AS digit
               FROM planted)
         SELECT lang, COUNT(*) AS n,
                CAST(SUM(latin) AS BIGINT) AS latin,
                CAST(SUM(cyrillic) AS BIGINT) AS cyrillic,
                CAST(SUM(cjk) AS BIGINT) AS cjk,
                CAST(SUM(arabic) AS BIGINT) AS arabic,
                CAST(SUM(digit) AS BIGINT) AS digits,
                CAST(SUM(total) AS BIGINT) AS total
         FROM c GROUP BY lang ORDER BY lang""",
    "t17_normalize" ->
      """WITH dirty AS (
           SELECT source, text,
             CASE WHEN doc_id % 4 = 1
                    THEN '  ' || text || '  ' || chr(13) || chr(10)
                  WHEN doc_id % 4 = 2 THEN '​﻿' || text || '‌‍'
                  WHEN doc_id % 4 = 3 THEN replace(text, ' ', '   ')
                  ELSE text END AS dirty
           FROM documents),
         c AS (SELECT source, text, dirty,
                 trim(regexp_replace(regexp_replace(dirty,
                   '[\x00-\x08\x0b\x0e-\x1f\x7f​‌‍﻿]', '', 'g'), '\s+', ' ', 'g'))
                   AS clean
               FROM dirty)
         SELECT source, COUNT(*) AS n,
                CAST(SUM(length(dirty)) AS BIGINT) AS dirty_len,
                CAST(SUM(length(clean)) AS BIGINT) AS clean_len,
                CAST(SUM(CASE WHEN clean = text THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_restored
         FROM c GROUP BY source ORDER BY source""",
    "t16b_bpe_tokenize_portable" -> {
      val mergeRows = pinnedMerges.zipWithIndex
        .map { case ((l, r), i) => s"(${i + 1},'$l','$r')" }.mkString(",")
      s"""WITH RECURSIVE
         m(idx, l, r) AS (SELECT * FROM (VALUES $mergeRows) v(idx, l, r)),
         w AS (SELECT lang, word, COUNT(*) AS freq
               FROM (SELECT lang,
                       unnest(string_split_regex(trim(lower(text)), '\\s+'))
                       AS word
                     FROM documents)
               WHERE len(word) > 0 GROUP BY 1, 2),
         v AS (SELECT DISTINCT word FROM w),
         steps AS (
           SELECT word, 1 AS idx,
                  list_append(string_split(word, ''), '</w>') AS syms
           FROM v
           UNION ALL
           SELECT word,
                  CASE WHEN pos IS NULL THEN idx + 1 ELSE idx END AS idx,
                  CASE WHEN pos IS NULL THEN syms
                       ELSE syms[:pos-1] || [syms[pos] || syms[pos+1]] ||
                            syms[pos+2:]
                  END AS syms
           FROM (
             SELECT s.word, s.idx, s.syms,
                    list_filter(range(1, len(s.syms)),
                      i -> s.syms[i] = m.l AND s.syms[i+1] = m.r)[1] AS pos
             FROM steps s JOIN m ON m.idx = s.idx
           )
         ),
         fin AS (SELECT word, syms FROM steps
                 WHERE idx = ${pinnedMerges.size + 1})
         SELECT w.lang, CAST(SUM(w.freq) AS BIGINT) AS n_words,
                CAST(SUM(len(f.syms) * w.freq) AS BIGINT) AS sym_sum,
                CAST(SUM((len(w.word) + 1) * w.freq) AS BIGINT)
                  AS unmerged_sum
         FROM w JOIN fin f ON w.word = f.word
         GROUP BY w.lang ORDER BY w.lang"""
    },
    "t15_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split_regex(trim(lower(text)),
                      '\s+')) AS word
                    FROM documents),
         f AS (SELECT word, COUNT(*) AS freq FROM w
               WHERE len(word) > 0 GROUP BY word),
         c AS (SELECT freq,
                      list_append(string_split(word, ''), '</w>') AS syms
               FROM f),
         p AS (SELECT freq, syms[i+1] AS l, syms[i+2] AS r
               FROM c, unnest(range(0, len(syms) - 1)) t(i)),
         g AS (SELECT l AS "left", r AS "right",
                      CAST(SUM(freq) AS BIGINT) AS pair_count
               FROM p GROUP BY l, r)
         SELECT "left", "right", pair_count FROM g
         ORDER BY pair_count DESC, "left", "right" LIMIT 30""",
    "t14_gopher_rules" ->
      s"""WITH dirty AS (
            SELECT source,
              CASE WHEN doc_id % 3 = 1
                     THEN text || ' # # # ... # ... # # ... #'
                   WHEN doc_id % 3 = 2
                     THEN '12345 67890 11111 22222 33333 44444 55555 ' || text
                   ELSE text END AS text
            FROM documents),
          t AS (SELECT source, text,
                  string_split_regex(trim(text), '\\s+') AS toks,
                  string_split_regex(trim(lower(text)), '\\s+') AS ltoks
                FROM dirty),
          m AS (SELECT source,
                  CAST(len(toks) AS BIGINT) AS n,
                  CAST(COALESCE(list_aggregate(
                    list_transform(toks, x -> len(x)), 'sum'), 0)
                    AS BIGINT) AS sum_len,
                  CAST(len(list_filter(toks,
                    x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
                  CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                    AS BIGINT) AS n_sym,
                  CAST(len(list_filter(ltoks, x -> x IN
                    (${enStop.map(w => s"'$w'").mkString(",")})))
                    AS BIGINT) AS n_stop
                FROM t),
          r AS (SELECT source,
                  (n >= 30 AND n <= 100000) AS words_ok,
                  (sum_len >= 3 * n AND sum_len <= 10 * n) AS mean_len_ok,
                  (10 * n_sym <= n) AS symbol_ok,
                  (5 * n_alpha >= 4 * n) AS alpha_ok,
                  (n_stop >= 2) AS stopword_ok
                FROM m)
          SELECT source, COUNT(*) AS n,
            CAST(SUM(CASE WHEN NOT words_ok THEN 1 ELSE 0 END) AS BIGINT)
              AS f_words,
            CAST(SUM(CASE WHEN NOT mean_len_ok THEN 1 ELSE 0 END) AS BIGINT)
              AS f_meanlen,
            CAST(SUM(CASE WHEN NOT symbol_ok THEN 1 ELSE 0 END) AS BIGINT)
              AS f_symbol,
            CAST(SUM(CASE WHEN NOT alpha_ok THEN 1 ELSE 0 END) AS BIGINT)
              AS f_alpha,
            CAST(SUM(CASE WHEN NOT stopword_ok THEN 1 ELSE 0 END) AS BIGINT)
              AS f_stop,
            CAST(SUM(CASE WHEN words_ok AND mean_len_ok AND symbol_ok
                           AND alpha_ok AND stopword_ok
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
          FROM r GROUP BY source ORDER BY source""",
    "t13_winnow_fp" ->
      """WITH base AS (
           SELECT doc_id, 0 AS side, text FROM documents
           UNION ALL
           SELECT doc_id, 1 AS side, substr(text, instr(text, ' ') + 1)
           FROM documents),
         t AS (SELECT doc_id, side,
                      string_split_regex(trim(lower(text)), '\s+') AS toks
               FROM base),
         g AS (SELECT doc_id, side,
                 CASE WHEN len(toks) < 3
                   THEN [md5(list_aggregate(toks, 'string_agg', ' '))]
                   ELSE list_transform(range(0, len(toks) - 2),
                     i -> md5(list_aggregate(toks[i+1:i+3],
                                             'string_agg', ' ')))
                 END AS grams
               FROM t),
         f AS (SELECT doc_id, side,
                 list_sort(list_distinct(
                   CASE WHEN len(grams) <= 4
                     THEN [list_aggregate(grams, 'min')]
                     ELSE list_transform(range(0, len(grams) - 3),
                       j -> list_aggregate(grams[j+1:j+4], 'min'))
                   END)) AS fp
               FROM g),
         r AS (SELECT a.doc_id,
                      len(list_intersect(a.fp, b.fp)) AS inter,
                      len(a.fp) + len(b.fp) -
                        len(list_intersect(a.fp, b.fp)) AS uni
               FROM f a JOIN f b
                 ON a.doc_id = b.doc_id AND a.side = 0 AND b.side = 1)
         SELECT COUNT(*) AS n_pairs,
                CAST(SUM(inter) AS BIGINT) AS sum_shared,
                CAST(SUM(CASE WHEN CAST(inter AS DOUBLE) / uni >= 0.5
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
                round(AVG(CAST(inter AS DOUBLE) / uni), 6)
                  AS avg_resemblance
         FROM r""",
    "t12_lm_surprisal" ->
      s"""WITH toks AS (SELECT doc_id, lang, $ltoksSql AS t FROM documents),
          bg AS (SELECT doc_id,
                        unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
                 FROM toks WHERE len(t) >= 2),
          pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bg),
          cb AS (SELECT w1, w2, COUNT(*) AS cb FROM pairs GROUP BY w1, w2),
          cu AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM cb
                 GROUP BY w1),
          v AS (SELECT COUNT(DISTINCT w) AS v
                FROM (SELECT unnest(t) AS w FROM toks)),
          scoredb AS (
            SELECT p.doc_id,
                   ln((COALESCE(cb.cb, 0) + 1.0) /
                      (COALESCE(cu.cu, 0) + 1.0 * v)) AS logp
            FROM pairs p
            LEFT JOIN cb USING (w1, w2)
            LEFT JOIN cu USING (w1)
            CROSS JOIN v),
          s AS (SELECT doc_id, -AVG(logp) AS surprisal
                FROM scoredb GROUP BY doc_id)
          SELECT lang, CAST(FLOOR(surprisal) AS BIGINT) AS band,
                 COUNT(*) AS n_docs,
                 round(AVG(surprisal), 6) AS mean_surprisal
          FROM s JOIN documents USING (doc_id)
          GROUP BY lang, band ORDER BY lang, band""",
    "t11_seq_pack" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n
                     FROM documents),
          c AS (SELECT doc_id, n,
                       SUM(n) OVER (ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n AS start_token
                FROM t)
          SELECT CAST(start_token // 512 AS BIGINT) AS seq_id,
                 COUNT(*) AS n_docs,
                 CAST(SUM(n) AS BIGINT) AS sum_tokens,
                 MIN(doc_id) AS first_doc,
                 CAST(MIN(start_token % 512) AS BIGINT) AS first_offset
          FROM c GROUP BY 1 ORDER BY seq_id""",
    "t06_chunking" ->
      s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
          c AS (SELECT lang,
                  unnest(list_transform(
                    range(0, GREATEST(1,
                      CAST(ceil((len(toks) - 10) / 40.0) AS INT))),
                    i -> list_aggregate(toks[i*40+1:i*40+50],
                                        'string_agg', ' '))) AS chunk
                FROM t)
          SELECT lang, COUNT(*) AS n_chunks,
            CAST(SUM(len(string_split_regex(trim(chunk), '\\s+'))) AS BIGINT)
              AS sum_chunk_tokens,
            CAST(MAX(len(string_split_regex(trim(chunk), '\\s+'))) AS INT)
              AS max_chunk_tokens
          FROM c GROUP BY lang ORDER BY lang""",
    "t07_repetition" ->
      s"""SELECT lang, CAST(FLOOR(r * 10) AS INT) AS bucket, COUNT(*) AS n
          FROM (
            SELECT lang,
              CASE WHEN len(toks) - 1 <= 0 THEN 0.0
                   ELSE 1.0 - CAST(len(list_distinct(list_transform(
                          range(0, len(toks) - 1),
                          i -> list_aggregate(toks[i+1:i+2],
                                              'string_agg', ' '))))
                        AS DOUBLE) / (len(toks) - 1)
              END AS r
            FROM (SELECT lang, $ltoksSql AS toks FROM documents))
          GROUP BY lang, bucket ORDER BY lang, bucket""",
    "c03_pareto_docs" ->
      """WITH m AS (
           SELECT doc_id,
                  CAST(length(text) AS BIGINT) AS len,
                  CAST(len(list_distinct(string_split_regex(
                    trim(lower(text)), '\s+'))) AS BIGINT) AS dtok,
                  CAST(list_max(list_transform(string_split_regex(
                    trim(lower(text)), '\s+'), t -> len(t)))
                    AS BIGINT) AS wmax
           FROM documents
           WHERE text IS NOT NULL AND length(trim(text)) > 0)
         SELECT doc_id, len, dtok, wmax FROM m p
         WHERE NOT EXISTS (
           SELECT 1 FROM m q
           WHERE q.len >= p.len AND q.dtok >= p.dtok AND q.wmax >= p.wmax
             AND (q.len > p.len OR q.dtok > p.dtok OR q.wmax > p.wmax))
         ORDER BY doc_id""",

    "c01_curation_funnel" ->
      s"""WITH deduped AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents
                             GROUP BY text)),
          t AS (SELECT doc_id,
                  string_split_regex(trim(text), '\\s+') AS toks,
                  string_split_regex(trim(lower(text)), '\\s+') AS ltoks,
                  text
                FROM deduped),
          m AS (SELECT doc_id,
                  CAST(len(toks) AS BIGINT) AS n,
                  CAST(COALESCE(list_aggregate(
                    list_transform(toks, x -> len(x)), 'sum'), 0)
                    AS BIGINT) AS sum_len,
                  CAST(len(list_filter(toks,
                    x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
                  CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                    AS BIGINT) AS n_sym,
                  CAST(len(list_filter(ltoks, x -> x IN
                    (${enStop.map(w => s"'$w'").mkString(",")})))
                    AS BIGINT) AS n_stop
                FROM t),
          g AS (SELECT doc_id, n FROM m
                WHERE n >= 30 AND n <= 100000
                  AND sum_len >= 3 * n AND sum_len <= 10 * n
                  AND 10 * n_sym <= n AND 5 * n_alpha >= 4 * n
                  AND n_stop >= 2),
          b AS (SELECT quantile_cont(n, 0.05) AS lo,
                       quantile_cont(n, 0.95) AS hi FROM g),
          banded AS (SELECT g.doc_id FROM g, b
                     WHERE n >= lo AND n <= hi)
          SELECT stage, n_docs FROM (
            SELECT '1_raw' AS stage, COUNT(*) AS n_docs FROM documents
            UNION ALL
            SELECT '2_exact_dedup', COUNT(*) FROM deduped
            UNION ALL
            SELECT '3_gopher', COUNT(*) FROM g
            UNION ALL
            SELECT '4_length_band', COUNT(*) FROM banded)
          ORDER BY stage""",
    "t08_length_band" ->
      s"""WITH l AS (SELECT lang, len($toksSql) AS n_tok FROM documents),
          b AS (SELECT quantile_cont(n_tok, 0.05) AS lo,
                       quantile_cont(n_tok, 0.95) AS hi FROM l)
          SELECT lang, COUNT(*) AS n_kept,
                 CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
          FROM l, b
          WHERE n_tok >= lo AND n_tok <= hi
          GROUP BY lang ORDER BY lang""",
    "t01_token_stats" ->
      s"""SELECT lang, COUNT(*) AS n,
           CAST(SUM(len($toksSql)) AS BIGINT) AS sum_tokens,
           CAST(SUM(len(regexp_extract_all(text,
             '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS sum_subwords,
           CAST(MAX(len($toksSql)) AS INT) AS max_tokens
          FROM documents GROUP BY lang ORDER BY lang""",
    "t02_quality_buckets" ->
      s"""SELECT lang, CAST(FLOOR(q * 10) AS INT) AS bucket, COUNT(*) AS n
          FROM (
            SELECT lang,
              GREATEST(0.0, LEAST(1.0,
                LEAST(CAST(len($toksSql) AS DOUBLE) / 100.0, 1.0) * 0.4 +
                LEAST((CASE WHEN len($toksSql) = 0 THEN 0.0
                       ELSE CAST(${hitsSql(enStop)} AS DOUBLE) / len($toksSql)
                       END) * 5.0, 1.0) * 0.4 +
                (1.0 - LEAST((CASE WHEN LENGTH(text) = 0 THEN 0.0
                  ELSE CAST(LENGTH(text) -
                       LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g'))
                       AS DOUBLE) / LENGTH(text) END) * 10.0, 1.0)) * 0.2
              )) AS q
            FROM documents)
          GROUP BY lang, bucket ORDER BY lang, bucket""",
    "t03_langid" ->
      s"""SELECT lang, pred, COUNT(*) AS n FROM (
            SELECT lang,
              CASE
                WHEN ${hitsSql(TextAnalysis.langStopwords("de"))} = 0
                 AND ${hitsSql(TextAnalysis.langStopwords("en"))} = 0
                 AND ${hitsSql(TextAnalysis.langStopwords("es"))} = 0
                 AND ${hitsSql(TextAnalysis.langStopwords("fr"))} = 0 THEN 'und'
                WHEN ${hitsSql(TextAnalysis.langStopwords("de"))} >=
                     GREATEST(${hitsSql(TextAnalysis.langStopwords("en"))},
                              ${hitsSql(TextAnalysis.langStopwords("es"))},
                              ${hitsSql(TextAnalysis.langStopwords("fr"))}) THEN 'de'
                WHEN ${hitsSql(TextAnalysis.langStopwords("en"))} >=
                     GREATEST(${hitsSql(TextAnalysis.langStopwords("es"))},
                              ${hitsSql(TextAnalysis.langStopwords("fr"))}) THEN 'en'
                WHEN ${hitsSql(TextAnalysis.langStopwords("es"))} >=
                     ${hitsSql(TextAnalysis.langStopwords("fr"))} THEN 'es'
                ELSE 'fr'
              END AS pred
            FROM documents)
          GROUP BY lang, pred ORDER BY lang, pred""",
    "t05_pii_redaction" ->
      """SELECT COUNT(*) AS n,
           CAST(SUM(CASE WHEN cleaned LIKE '%[EMAIL]%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_email_redacted,
           CAST(SUM(CASE WHEN cleaned LIKE '%[PHONE]%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_phone_redacted,
           CAST(SUM(CASE WHEN regexp_matches(cleaned, '@example\.com')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_email_residue
         FROM (
           SELECT regexp_replace(
                    regexp_replace(
                      text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                        '@example.com or +1202555' ||
                        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                      '[EMAIL]', 'g'),
                    '\+?[0-9]{10,12}', '[PHONE]', 'g') AS cleaned
           FROM documents)""",
    "t04_fingerprint" ->
      s"""SELECT lang, COUNT(DISTINCT fp) AS n_distinct, MIN(fp) AS min_fp
          FROM (SELECT lang,
                  sha256(list_aggregate(list_sort(list_distinct($ltoksSql)),
                    'string_agg', ' ')) AS fp
                FROM documents)
          GROUP BY lang ORDER BY lang"""
  )
}
