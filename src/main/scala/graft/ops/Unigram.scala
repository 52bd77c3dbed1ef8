package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece
  * unigram model) — the OTHER major subword family next to BPE
  * (t15/t16): BPE builds a vocabulary bottom-up by merge frequency;
  * the unigram model starts from a LARGE candidate vocabulary and
  * keeps the pieces that maximize corpus likelihood, segmenting each
  * word by VITERBI — the max-score split under per-piece log-
  * probabilities. The two public surfaces:
  *
  *  - [[segmentWords]] — Viterbi segmentation under a FIXED literal
  *    vocabulary of integer fixed-point scores. Everything is
  *    integer/string algebra: the DP is a codegen'd `aggregate` fold
  *    over character positions (flat Long array [score₀, back₀,
  *    score₁, back₁, …]), the walk-back a second fold over the
  *    extracted back-pointer array — hash-exact against a DuckDB
  *    replay (flat-list fold + recursive-CTE walk; struct-typed
  *    reduce accumulators miscompile in DuckDB 1.0, so BOTH engines
  *    stay on the flat-array form).
  *  - [[trainUnigram]] — Viterbi-EM training: candidate substrings
  *    (length ≤ maxPieceLen) weighted by word frequency seed the
  *    vocabulary; each EM round re-segments every distinct word
  *    under the current scores (the same DP, scores looked up in a
  *    per-word map column — zero UDFs) and re-estimates scores from
  *    the piece counts (floor(ln(count/total)·10⁶), the integer
  *    fixed-point log-prob). The driver loop holds only the round
  *    counter — candidates, segmentations, and counts all stay
  *    distributed (the `bpeTrainMerges` shape).
  *
  * Scale shape: everything keys on (word) or (piece) — shuffles on
  * natural keys, vocab frames broadcast-sized by construction
  * (top-`vocabSize`), per-word state bounded by word length ≤ 20.
  * The corpus is touched once (word counts); every EM round runs on
  * the DISTINCT-word frame, bounded by vocabulary not corpus size.
  *
  * Reference capability: none — LLM-pipeline extension surface
  * (tokenizer training next to t15/t16's BPE), mandated by the r12
  * verdict (#5).
  */
object Unigram {

  /** Unreachable-path sentinel: far below any real path score, far
    * above Long underflow even summed over a max-length word.
    */
  private val Neg = -1000000000000L

  /** The Viterbi DP as a SQL fold (object doc): returns the flat
    * [score₀, back₀, …] array expression over `wordExpr`, with piece
    * scores supplied by `scoreOf` (a SQL fragment builder, so the
    * literal-CASE and map-lookup forms share the DP). 0-based: cell
    * for prefix length p sits at [2p] (score) and [2p+1] (back).
    */
  private def dpExpr(wordExpr: String, scoreOf: String => String,
                     maxPieceLen: Int): Column = {
    val piece = s"substring($wordExpr, j + 1, i - j)"
    val best = s"array_max(transform(" +
      s"sequence(greatest(i - $maxPieceLen, 0), i - 1), " +
      s"j -> named_struct('s', acc[2*j] + (${scoreOf(piece)}), " +
      "'nj', -j)))"
    expr(s"aggregate(sequence(1, length($wordExpr)), array(0L, -1L), " +
      s"(acc, i) -> concat(acc, flatten(transform(array($best), " +
      "b -> array(b.s, cast(-b.nj as bigint))))))")
  }

  /** Adds `__dp`, then `score_fp` (total), `__backs`, and the
    * walk-back outputs `n_pieces` + `seg` ('|'-joined pieces in
    * order) to `df`.
    */
  private def withViterbi(df: DataFrame, wordCol: String,
                          scoreOf: String => String,
                          maxPieceLen: Int): DataFrame = {
    val w = wordCol
    df.withColumn("__dp", dpExpr(w, scoreOf, maxPieceLen))
      .withColumn("score_fp", expr(s"__dp[cast(2 * length($w) as int)]"))
      .withColumn("__backs",
        expr(s"transform(sequence(1, length($w)), p -> __dp[2*p + 1])"))
      .withColumn("__walk", expr(
        s"aggregate(sequence(1, length($w)), " +
          s"named_struct('pos', length($w), 'seg', '', 'np', 0L), " +
          "(a2, x) -> if(a2.pos <= 0, a2, named_struct(" +
          "'pos', cast(__backs[a2.pos - 1] as int), " +
          s"'seg', concat(substring($w, " +
          "cast(__backs[a2.pos - 1] + 1 as int), " +
          "cast(a2.pos - __backs[a2.pos - 1] as int)), " +
          "if(a2.np > 0, '|', ''), a2.seg), " +
          "'np', a2.np + 1L)))"))
      .withColumn("n_pieces", col("__walk.np"))
      .withColumn("seg", col("__walk.seg"))
      .drop("__dp", "__backs", "__walk")
  }

  /** Viterbi segmentation under a literal `(piece → score_fp)` vocab
    * (object doc). Input: one column `wordCol` of lowercase words
    * (length ≥ 1); single characters absent from the vocab score
    * `charFallback`, absent multi-char pieces are unreachable.
    * Output per row: the word, `n_pieces`, `score_fp` (total path
    * score), `seg`. Ties break toward the SMALLEST back index (=
    * longest final piece), deterministically in both engines.
    */
  def segmentWords(words: DataFrame, wordCol: String,
                   vocab: Seq[(String, Long)], charFallback: Long,
                   maxPieceLen: Int = 4): DataFrame = {
    require(vocab.nonEmpty, "vocab must be nonempty")
    require(vocab.forall { case (p, _) =>
      p.nonEmpty && p.length <= maxPieceLen && !p.contains("'") },
      s"pieces must be 1..$maxPieceLen chars, no quotes")
    require(vocab.forall(v => v._2 > Neg / 2 && v._2 <= 0L) &&
      charFallback > Neg / 2 && charFallback <= 0L,
      "scores must be log-prob-like: in (Neg/2, 0]")
    val cases = vocab.map { case (p, s) => s"WHEN '$p' THEN ${s}L" }
      .mkString(" ")
    val scoreOf = (pe: String) => s"CASE $pe $cases ELSE " +
      s"CASE WHEN length($pe) = 1 THEN ${charFallback}L " +
      s"ELSE ${Neg}L END END"
    withViterbi(
      words.filter(col(wordCol).isNotNull && length(col(wordCol)) >= 1),
      wordCol, scoreOf, maxPieceLen)
  }

  /** All substrings of `wordCol` up to `maxPieceLen` chars, one row
    * per distinct (word-row, piece) — the candidate generator and the
    * per-word vocab-coverage probe share it.
    */
  private def pieces(words: DataFrame, wordCol: String,
                     maxPieceLen: Int): DataFrame =
    words.withColumn("piece", explode(expr(
      s"array_distinct(flatten(transform(sequence(1, length($wordCol)), " +
        s"s -> transform(sequence(1, least($maxPieceLen, " +
        s"length($wordCol) - s + 1)), l -> substring($wordCol, s, l)))))")))

  /** Viterbi-EM unigram training (object doc). `words` carries one
    * row per DISTINCT word with its corpus frequency. Returns the
    * final vocabulary: `piece`, `cnt` (expected count from the last
    * E-step, frequency-weighted), `score_fp` = floor(ln(cnt/total)·
    * 10⁶). Single characters ride the implicit `charFallback` floor,
    * so every word always has a segmentation.
    */
  def trainUnigram(words: DataFrame, wordCol: String, freqCol: String,
                   vocabSize: Int, emIters: Int = 2,
                   maxPieceLen: Int = 4,
                   charFallback: Long = -20000000L): DataFrame = {
    require(vocabSize >= 1 && vocabSize <= 65536,
      s"vocabSize in [1, 65536], got $vocabSize")
    require(emIters >= 1 && emIters <= 8,
      s"emIters in [1, 8], got $emIters")
    val w = words.filter(col(wordCol).isNotNull &&
        length(col(wordCol)).between(1, 20) && col(freqCol) >= 1L)
      .select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed vocabulary: multi-char substrings by weighted count
    // (overlaps counted once per word, the cheap seed), top-N
    // deterministic on (cnt DESC, piece)
    val seed = pieces(w, "word", maxPieceLen)
      .filter(length(col("piece")) >= 2)
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    def rescore(counted: DataFrame): DataFrame = {
      // integer fixed-point log-prob; the 1-row total broadcasts
      val tot = counted.agg(sum(col("cnt")).as("__t"))
      counted.crossJoin(broadcast(tot))
        .select(col("piece"), col("cnt"),
          floor(log(col("cnt").cast("double") / col("__t")) * 1e6)
            .cast("long").as("score_fp"))
    }
    var vocab = Layout.materializeBounded(rescore(seed),
      maxRows = 2L * vocabSize)
    val scoreOf = (pe: String) => s"coalesce(element_at(__m, $pe), " +
      s"CASE WHEN length($pe) = 1 THEN ${charFallback}L " +
      s"ELSE ${Neg}L END)"
    var iter = 0
    while (iter < emIters) {
      // E-step: per-word score map (map lookups are order-free, so
      // the nondeterministic collect_list order is harmless), then
      // the shared Viterbi fold, then frequency-weighted piece counts
      val wmap = pieces(w, "word", maxPieceLen)
        .join(broadcast(vocab.select(col("piece"), col("score_fp"))),
          Seq("piece"))
        .groupBy(col("word"), col("freq"))
        .agg(map_from_arrays(collect_list(col("piece")),
          collect_list(col("score_fp"))).as("__m"))
      val allWords = w.join(wmap.select(col("word"), col("__m")),
          Seq("word"), "left")
        .withColumn("__m", coalesce(col("__m"),
          expr("map()").cast("map<string,bigint>")))
      val counts = withViterbi(allWords, "word", scoreOf, maxPieceLen)
        .select(col("freq"), explode(split(col("seg"), "\\|")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
      vocab = Layout.materializeBounded(rescore(counts),
        maxRows = 2L * vocabSize)
      iter += 1
    }
    w.unpersist(blocking = false)
    vocab
  }
}
