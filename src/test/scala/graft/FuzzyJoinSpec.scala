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
