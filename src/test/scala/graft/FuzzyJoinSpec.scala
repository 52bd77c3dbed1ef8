package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  def vocab = Seq("join", "hash", "scan", "row").toDF("w")

  test("corrections picks the nearest candidate within the block") {
    val terms = Seq("joi~", "scat", "hsah", "xash", "row").toDF("t")
    val got = FuzzyJoin.corrections(terms, "t", vocab, "w", maxDist = 1)
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("joi~") == (("join", 1L)))   // planted typo recovers
    assert(got("scat") == (("scan", 1L)))   // substitution in range
    assert(got("row") == (("row", 0L)))     // exact hit at distance 0
    assert(!got.contains("hsah"),           // transposition = distance 2
      got.toString)
    assert(!got.contains("xash"),           // first-char block excludes
      got.toString)
  }

  test("distance ties break alphabetically") {
    val v = Seq("abce", "abcd").toDF("w")
    val got = FuzzyJoin.corrections(Seq("abc~").toDF("t"), "t", v, "w", 1)
      .as[(String, String, Long)].collect()
    assert(got.toSeq == Seq(("abc~", "abcd", 1L)), got.mkString(","))
  }

  test("resolveEntities: transitive closure, total mapping, min-id canon") {
    // head-noise variants share the SUFFIX block and resolve; a
    // trailing-char edit (11) changes the suffix key and deliberately
    // stays out — the documented trade-off of suffix blocking (head
    // noise is the common case); "zenith labs" is a singleton; case
    // folds before matching; transitivity: 13 is dist 1 from 12 but
    // dist 3 from 10, bound only through the chain
    val rows = Seq(
      (10L, "Acme Corporation"),
      (11L, "acme corporatio"),   // trailing drop → different block
      (12L, "me corporation"),    // leading drop: dist 2 to 10
      (13L, "e corporation"),     // dist 1 to 12, dist 3 to 10 (chain)
      (30L, "zenith labs")
    ).toDF("rid", "nm")
    val got = FuzzyJoin.resolveEntities(rows, "rid", "nm",
      blockChars = 6, maxDist = 2)
      .select($"id", $"entity_id").as[(Long, Long)].collect().toMap
    assert(got(10L) == 10L && got(12L) == 10L && got(13L) == 10L,
      s"closure must bind the chain incl. dist-3 ends: $got")
    assert(got(11L) == 11L, "suffix blocking skips trailing edits")
    assert(got(30L) == 30L, "singleton maps to itself")
    assert(got.size == 5, "mapping is total")
  }

  test("editDistanceLookup ≡ brute-force θ-join (no false negatives)") {
    // Mutated copies of base sentences at distance 1–2 plus unrelated
    // text; repeated-gram strings exercise the occurrence tagging (an
    // untagged gram SET would under-count their multiset overlap).
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jump"),    // 1 deletion from 1
      (3L, "the quick crown fox jumps"),   // 1 substitution from 1
      (4L, "a completely different text"),
      (5L, "aaaaaaaaaaaaaaaaaa"),          // repeated grams
      (6L, "aaaaaaaaaaaaaaaabb"),          // dist 2 from 5
      (7L, "zzzzzzzzzzzzzzzzzz")
    ).toDF("cid", "cs")
    val probes = Seq(
      (101L, "the quick brown fox jumps"),
      (105L, "aaaaaaaaaaaaaaaaaa")
    ).toDF("pid", "ps")
    val got = FuzzyJoin.editDistanceLookup(corpus, "cid", "cs",
        probes, "pid", "ps", maxDist = 2, q = 3)
      .as[(Long, Long, Long)].collect().toSet
    val want = probes.as[(Long, String)].collect().flatMap { case (pid, ps) =>
      corpus.as[(Long, String)].collect().flatMap { case (cid, cs) =>
        val dMax = math.max(ps.length, cs.length)
        val dp = Array.tabulate(ps.length + 1)(i => i)
        var prev = 0
        for (j <- 1 to cs.length) {
          prev = dp(0); dp(0) = j
          for (i <- 1 to ps.length) {
            val t = dp(i)
            dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
              prev + (if (ps(i - 1) == cs(j - 1)) 0 else 1))
            prev = t
          }
        }
        val d = dp(ps.length)
        if (d <= 2) Some((pid, cid, d.toLong)) else None
      }
    }.toSet
    assert(got == want, s"got=$got want=$want")
    assert(got.contains((105L, 6L, 2L)),
      "repeated-gram pair must survive the tagged prefix filter")
  }

  test("editDistanceLookup excludes strings below the q(τ+1) contract") {
    val corpus = Seq((1L, "abcdefghi"), (2L, "abc")).toDF("cid", "cs")
    val probes = Seq((9L, "abcdefghi"), (8L, "ab")).toDF("pid", "ps")
    val got = FuzzyJoin.editDistanceLookup(corpus, "cid", "cs",
        probes, "pid", "ps", maxDist = 2, q = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((9L, 1L, 0L)), got.toString)
  }

  test("vocabulary side broadcasts (hash join, not nested loop)") {
    val terms = Seq("joi~", "scat").toDF("t")
    val df = FuzzyJoin.corrections(terms, "t", vocab, "w", maxDist = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, plan.toString)
  }
}
