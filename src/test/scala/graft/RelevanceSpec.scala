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

  test("bm25Retrieval with one query ≡ the single-bag bm25 scores") {
    val qs = Seq((100L, "cherry apple")).toDF("query_id", "qtext")
    val got = Relevance.bm25Retrieval(corpus, qs, "text", "doc_id",
      "query_id", "qtext", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("bm25")).toMap
    val ref = Relevance.bm25(corpus, "text", "doc_id",
      Seq("cherry", "apple"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("bm25")).toMap
    // retrieval sums round(score,7) per term (the spillable decimal
    // HashAggregate contract), so it matches the raw fold to 1e-6 with
    // ≤ a handful of query terms, not bit-exactly
    assert(got.keySet == ref.keySet, s"retrieval $got vs single-query $ref")
    got.foreach { case (id, v) =>
      assert(math.abs(v - ref(id)) < 1e-6,
        s"doc $id: retrieval $v vs single-query ${ref(id)}")
    }
  }

  test("bm25Retrieval: per-query isolation, k bound, rank order") {
    val qs = Seq((1L, "apple"), (2L, "durian")).toDF("query_id", "qtext")
    val rows = Relevance.bm25Retrieval(corpus, qs, "text", "doc_id",
      "query_id", "qtext", k = 1)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("rank")))
    // k=1: exactly one row per query; apple's best is doc 1 (tf=2),
    // durian's only bearer is doc 3 — queries never leak into each other
    assert(rows.toSet == Set((1L, 1L, 1), (2L, 3L, 1)))
  }

  test("textRank: the hub token of a star co-occurrence graph ranks first") {
    // "hub" co-occurs with every other token (window 1 adjacency);
    // leaves only see the hub → star graph, center takes the most mass
    val df = Seq((1L, "hub aa hub bb hub cc hub dd"))
      .toDF("doc_id", "text")
    val top = Relevance.textRank(df, "text", "doc_id",
      window = 1, minPairs = 1L, iters = 3, topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head._1 == "hub", s"got ${top.toSeq}")
    assert(top.tail.forall(_._2 < top.head._2),
      "leaves must rank strictly below the hub")
  }

  test("pmi: hand-computed windowed pair stats") {
    // doc1 [a,b,a] → pairs (a,b),(a,a),(a,b); doc2 [b,c] → (b,c)
    // npairs=4; unigrams a:2 b:2 c:1, ntok=5
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = Relevance.pmi(docs, "text", "doc_id", window = 5,
        minPairs = 1L)
      .collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        (r.getAs[Long]("n_pair"), r.getAs[Long]("c_a"),
          r.getAs[Long]("c_b"), r.getAs[Double]("pmi")))
      .toMap
    assert(got.keySet == Set(("a", "b"), ("a", "a"), ("b", "c")))
    assert(got(("a", "b"))._1 == 2L)
    // pmi(a,b) = ln((2/4) / ((2/5)·(2/5))) = ln(3.125)
    val exp = math.rint(math.log((2.0 / 4) / ((2.0 / 5) * (2.0 / 5))) * 1e9) / 1e9
    assert(got(("a", "b"))._4 == exp)
    assert(got(("a", "a")) == ((1L, 2L, 2L,
      math.rint(math.log((1.0 / 4) / ((2.0 / 5) * (2.0 / 5))) * 1e9) / 1e9)))

    // window truncation: 8 tokens, window=2 → 7 + 6 = 13 total pairs,
    // and (h1, h4) is OUT of window so it never appears
    val wide = Seq((1L, "h1 h2 h3 h4 h5 h6 h7 h8")).toDF("doc_id", "text")
    val pairs = Relevance.pmi(wide, "text", "doc_id", window = 2,
      minPairs = 1L)
    assert(pairs.agg(sum($"n_pair")).head().getLong(0) == 13L)
    assert(pairs.filter($"a" === "h1" && $"b" === "h4").count() == 0)

    // minPairs bounds the output
    assert(Relevance.pmi(docs, "text", "doc_id", window = 5,
      minPairs = 2L).count() == 1)

    // single-token and empty docs must not break pair generation
    val degenerate = Seq((1L, "solo"), (2L, ""), (3L, "x y"))
      .toDF("doc_id", "text")
    assert(Relevance.pmi(degenerate, "text", "doc_id", window = 3,
      minPairs = 1L).count() == 1)
  }

  test("zipfSlope: an exact power law fits slope −1, a flat " +
    "distribution fits slope 0") {
    // tf(r) = 1e6 / r — a pure Zipf-1 curve (values large enough that
    // integer rounding barely perturbs the log-log line)
    val zipf = (1 to 50)
      .map(r => (f"t$r%03d", math.round(1e6 / r)))
      .toDF("term", "tf")
    val z = Relevance.zipfSlope(zipf, topN = 50).first()
    assert(z.getLong(0) == 50L)
    assert(math.abs(z.getDouble(1) + 1.0) < 1e-3, z.toString)
    val flat = (1 to 50).map(r => (f"t$r%03d", 1000L)).toDF("term", "tf")
    val f = Relevance.zipfSlope(flat, topN = 50).first()
    assert(f.getDouble(1) == 0.0, f.toString)
    // intercept of the power law recovers ln(C)
    assert(math.abs(z.getDouble(2) - math.log(1e6)) < 1e-2, z.toString)
  }
}
