package graft

import graft.ops.Unigram

/** Unigram-LM tokenizer: hand-computed Viterbi DP, tie-break and
  * fallback paths, and a hand-derived EM round on a toy corpus.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq(("ab", -200L), ("abc", -300L), ("cd", -400L))

  private def seg(ws: Seq[String]) =
    Unigram.segmentWords(ws.toDF("word"), "word", vocab,
        charFallback = -1000L)
      .select($"word", $"n_pieces", $"score_fp", $"seg")
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("hand-computed DP: 'ab|cd' beats 'abc|d' and char fallbacks") {
    // abcd: ab|cd = -600; abc+d = -300-1000 = -1300; a|b|cd = -2400
    val got = seg(Seq("abcd", "ab", "x", "zq"))
    assert(got("abcd") == ((2L, -600L, "ab|cd")), got.toString)
    assert(got("ab") == ((1L, -200L, "ab")))
    // single char not in vocab -> fallback
    assert(got("x") == ((1L, -1000L, "x")))
    // no multi-char piece applies -> all-fallback path
    assert(got("zq") == ((2L, -2000L, "z|q")))
  }

  test("tie-break: equal-score splits resolve to the SMALLEST back " +
      "index (longest final piece), deterministically") {
    // vocab pq = qr = -500, chars -500: 'pqr' has p|qr and pq|r both
    // -1000 and p|q|r -1500; smallest back at pos 3 wins -> final
    // piece 'qr' (back 1 beats back 2)
    val got = Unigram.segmentWords(Seq("pqr").toDF("word"), "word",
        Seq(("pq", -500L), ("qr", -500L)), charFallback = -500L)
      .select($"n_pieces", $"score_fp", $"seg")
      .as[(Long, Long, String)].head()
    assert(got == ((2L, -1000L, "p|qr")), got.toString)
  }

  test("EM round by hand: counts re-estimate as floor(ln(c/t)*1e6) " +
      "and the vocab prunes to top-N on (cnt, piece)") {
    // corpus: 'abab' x3, 'ab' x2 -> seed multi-char substrings
    // (weighted, distinct per word): ab:5, ba:3, aba:3, bab:3, abab:3
    val words = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "freq")
    val got = Unigram.trainUnigram(words, "word", "freq",
        vocabSize = 2, emIters = 1, maxPieceLen = 4)
      .select($"piece", $"cnt", $"score_fp")
      .as[(String, Long, Long)].collect().toSet
    // seed top-2 = ab(5), aba(3); E-step: 'abab' -> ab|ab (two seed
    // pieces; aba+b loses: char fallback dwarfs), 'ab' -> ab;
    // counts: ab = 3*2 + 2 = 8, nothing else survives len>=2
    // M-step: total 8 -> score ln(8/8)=0
    assert(got == Set(("ab", 8L, 0L)), got.toString)
  }

  test("guards: empty vocab, quoted pieces, positive scores all loud") {
    intercept[IllegalArgumentException] {
      Unigram.segmentWords(Seq("a").toDF("word"), "word", Seq.empty, -1L)
    }
    intercept[IllegalArgumentException] {
      Unigram.segmentWords(Seq("a").toDF("word"), "word",
        Seq(("a'b", -1L)), -1L)
    }
    intercept[IllegalArgumentException] {
      Unigram.segmentWords(Seq("a").toDF("word"), "word",
        Seq(("ab", 5L)), -1L)
    }
  }
}
