package graft

import graft.ops.Similarity

/** Hand-computed gates for L2 brute force, reciprocal-rank fusion,
  * k-center coreset selection, and n-gram novelty. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopKL2: nearest by euclidean where cosine disagrees") {
    // query (1,0): cosine prefers the colinear far point (10,0);
    // L2 prefers the nearby off-angle point (0.9, 0.1)
    val corpus = Seq((10L, Array(10.0, 0.0)), (20L, Array(0.9, 0.1)))
      .toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val l2Top = Similarity.bruteForceTopKL2(corpus, q, "vec_id",
      "embedding", k = 1).select("vec_id").as[Long].head()
    val cosTop = Similarity.bruteForceTopK(corpus, q, "vec_id",
      "embedding", k = 1).select("vec_id").as[Long].head()
    assert(l2Top === 20L)
    assert(cosTop === 10L)
  }

  test("rrfFuse: hand-computed two-run fusion, rank ties to lowest id") {
    // run A: d10@1, d20@2 — run B: d20@1, d30@2 (query 1)
    val runs = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 20L, 1),
      (1L, 30L, 2)).toDF("q", "id", "rank")
    val got = Similarity.rrfFuse(runs, "q", "id", "rank",
        k0 = 60, topK = 3)
      .orderBy("rank")
      .select("vec_id", "rrf").as[(Long, Double)].collect()
    val r61 = BigDecimal(1.0 / 61).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val r62 = BigDecimal(1.0 / 62).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(got.map(_._1).toSeq === Seq(20L, 10L, 30L))
    assert(approx(got(0)._2, (r61 + r62).toDouble))
    assert(approx(got(1)._2, r61.toDouble))
    assert(approx(got(2)._2, r62.toDouble))
  }

  test("rrfFuse: equal scores tie-break to the lowest id") {
    // both docs appear at the same rank in one run each
    val runs = Seq((1L, 50L, 1), (1L, 40L, 1)).toDF("q", "id", "rank")
    val got = Similarity.rrfFuse(runs, "q", "id", "rank", topK = 2)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got === Seq(40L, 50L))
  }

  test("kCenterCoreset: farthest-point traversal with lowest-id ties") {
    // line positions 0,1,9,10: seed=lowest id (pos 0); farthest is 10
    // (d2=100); then min-dists are 1 for both remaining -> tie to the
    // lower id (pos 1), then pos 9
    val pts = Seq((1L, Array(0.0)), (2L, Array(1.0)), (3L, Array(9.0)),
      (4L, Array(10.0))).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.kCenterCoreset(pts, "vec_id",
        "embedding", k = 4)
      .orderBy("pick")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === Seq((1, 1L, None), (2, 4L, Some(100.0)),
      (3, 2L, Some(1.0)), (4, 3L, Some(1.0))))
  }

  test("kCenterCoreset: k beyond the point count exhausts gracefully") {
    val pts = Seq((1L, Array(0.0)), (2L, Array(5.0)))
      .toDF("vec_id", "embedding")
    assert(graft.ops.Similarity.kCenterCoreset(pts, "vec_id",
      "embedding", k = 5).count() === 2L)
  }

  test("ngramNovelty: min-id ownership splits shared vs new shingles") {
    // A(1): shingles {a b c, b c d} both first-owned by 1 -> 1.0
    // B(2): {a b c} owned by 1, {b c x} owned by 2 -> 0.5
    val docs = Seq((1L, "a b c d"), (2L, "a b c x")).toDF("doc_id", "text")
    val got = graft.ops.Dedup.ngramNovelty(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5)))
  }

  test("rbo: identical lists carry the truncated mass 1−p^k, disjoint " +
    "lists zero, head agreement outweighs tail agreement") {
    import graft.ops.Similarity
    def ranking(q: Long, ids: Seq[Long]) =
      ids.zipWithIndex.map { case (id, i) => (q, id, i + 1) }
    val k = 10
    val idsA = (1L to 10L)
    val same = ranking(0L, idsA).toDF("query_id", "vec_id", "rank")
    val r1 = Similarity.rboTruncated(same, same, k = k, p = 0.9).first()
    assert(r1.getLong(1) == 10L)
    assert(math.abs(r1.getDouble(2) - (1.0 - math.pow(0.9, k))) < 1e-4,
      r1.toString)
    val disjoint = ranking(0L, 11L to 20L).toDF("query_id", "vec_id", "rank")
    val r0 = Similarity.rboTruncated(same, disjoint, k = k, p = 0.9).first()
    assert(r0.getLong(1) == 0L && r0.getDouble(2) == 0.0, r0.toString)
    // one shared item: at the HEAD of both lists vs at the TAIL of both
    val headB = ranking(0L, 1L +: (21L to 29L)).toDF("query_id", "vec_id", "rank")
    val tailB = ranking(0L, (21L to 29L) :+ 10L).toDF("query_id", "vec_id", "rank")
    val head = Similarity.rboTruncated(same, headB, k = k, p = 0.9)
      .first().getDouble(2)
    val tail = Similarity.rboTruncated(same, tailB, k = k, p = 0.9)
      .first().getDouble(2)
    assert(head > 5 * tail, s"head $head vs tail $tail")
  }
}
