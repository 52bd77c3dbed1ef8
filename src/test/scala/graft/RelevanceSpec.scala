package graft

import org.apache.spark.sql.functions._

import graft.ops.Relevance

/** TF-IDF / BM25 relevance operators: hand-checkable scores on a tiny
  * corpus plus ranking sanity.
  */
class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian")).toDF("doc_id", "text")

  test("tfidf matches the sklearn smooth-idf formula by hand") {
    val got = Relevance.tfidf(corpus, "text", "doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("tfidf")))
      .toMap
    // apple: tf=2 in doc 1, df=1, N=3 → idf = ln(4/2)+1
    val idfApple = math.log(4.0 / 2) + 1
    assert(got((1L, "apple")) == ((2L, 1L, 2 * idfApple)))
    // banana: df=2 → idf = ln(4/3)+1; tf=1 in both docs
    val idfBanana = math.log(4.0 / 3) + 1
    assert(got((1L, "banana"))._3 == idfBanana)
    assert(got((2L, "banana"))._3 == idfBanana)
    assert(got((3L, "cherry"))._1 == 3L)
  }

  test("vocabulary applies min-df floor and max-df-ratio ceiling") {
    // df: apple 1, banana 2, cherry 2, durian 1 over N=3 docs
    val all = Relevance.vocabulary(corpus, "text", "doc_id")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(all == Map("apple" -> ((2L, 1L)), "banana" -> ((2L, 2L)),
      "cherry" -> ((4L, 2L)), "durian" -> ((1L, 1L))))
    // floor cuts the df=1 tail
    val floored = Relevance.vocabulary(corpus, "text", "doc_id", minDf = 2)
      .select("term").as[String].collect().toSet
    assert(floored == Set("banana", "cherry"))
    // ceiling cuts stopword-like terms: df=2 > 0.5*3
    val ceiled = Relevance.vocabulary(corpus, "text", "doc_id",
      maxDfRatio = 0.5)
      .select("term").as[String].collect().toSet
    assert(ceiled == Set("apple", "durian"))
  }

  test("bm25 ranks the term-dense document first and saturates tf") {
    val scores = Relevance.bm25(corpus, "text", "doc_id", Seq("cherry"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25"))
      .toMap
    assert(scores.keySet == Set(2L, 3L), "only cherry-bearing docs score")
    assert(scores(3L) > scores(2L), "tf=3 must outrank tf=1")
    // k1 saturation: tripling tf must NOT triple the score
    assert(scores(3L) < 3 * scores(2L) * 1.5)
    // multi-term query covers more docs, never fewer
    val multi = Relevance.bm25(corpus, "text", "doc_id",
      Seq("cherry", "apple"))
    assert(multi.count() == 3)
  }
}
