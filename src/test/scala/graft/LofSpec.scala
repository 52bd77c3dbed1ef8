package graft

import graft.ops.Similarity

/** Local Outlier Factor semantics: density outliers score high,
  * uniform-cluster members score ~1, degenerate guards hold. Exact
  * engine↔oracle parity lives on n16.
  */
class LofSpec extends SparkSpec {
  import spark.implicits._

  // a tight 1-d cluster plus one far point
  lazy val pts = Seq(
    (0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(2.0f)),
    (3L, Seq(3.0f)), (4L, Seq(4.0f)), (5L, Seq(100.0f))
  ).toDF("vec_id", "embedding")

  test("the isolated point gets the highest LOF, well above 1") {
    val out = Similarity.lofOutliers(pts, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("lof")).toMap
    assert(out.size == 6)
    val maxId = out.maxBy(_._2)._1
    assert(maxId == 5L, s"outlier should win: $out")
    assert(out(5L) > 2.0, s"lof(far) = ${out(5L)}")
    // interior cluster members sit near 1 (uniform local density)
    assert(out(2L) < 1.3 && out(3L) < 1.3, s"inliers: $out")
  }

  test("kdist and lrd are positive and lrd falls with isolation") {
    val rows = Similarity.lofOutliers(pts, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("kdist"), r.getAs[Double]("lrd"))).toMap
    rows.values.foreach { case (kd, lrd) =>
      assert(kd > 0 && lrd > 0, s"rows: $rows")
    }
    assert(rows(5L)._1 > rows(2L)._1, "far point has larger k-distance")
    assert(rows(5L)._2 < rows(2L)._2, "far point has lower density")
  }

  test("coincident points yield null lrd, not an ANSI failure") {
    val dup = Seq((0L, Seq(1.0f)), (1L, Seq(1.0f)), (2L, Seq(1.0f)),
      (3L, Seq(1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.lofOutliers(dup, "vec_id", "embedding", k = 2)
      .collect()
    assert(out.length == 4)
    out.foreach(r => assert(r.isNullAt(r.fieldIndex("lrd")),
      s"zero reach-sum must null out, got $r"))
  }

  // two 1-d clusters with distinct labels
  lazy val labeled = Seq(
    (0L, Seq(0.0f), 0), (1L, Seq(1.0f), 0), (2L, Seq(2.0f), 0),
    (3L, Seq(10.0f), 1), (4L, Seq(11.0f), 1), (5L, Seq(12.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("knnVote: majority label wins, true label rides along") {
    val qs = labeled.filter($"vec_id" === 0L || $"vec_id" === 5L)
    val out = Similarity.knnVote(labeled, qs, "vec_id", "embedding",
        "label", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    // q0's 3-NN = {1, 2, 3}: labels {0, 0, 1} -> pred 0, 2 votes
    assert(out(0L) === ((0, 0, 2L)))
    // q5's 3-NN = {4, 3, 2}: labels {1, 1, 0} -> pred 1, 2 votes
    assert(out(5L) === ((1, 1, 2L)))
  }

  test("ANN-fed LOF ≡ exact LOF when the index recall is 1.0") {
    // nprobe = 2^nPlanes probes every cell, so ivfTopKL2Portable's
    // scored set is exactly bruteForceTopKL2's — lofFromKnn must then
    // be bit-equal to lofOutliers (the n16b contract)
    val knn = Similarity.ivfTopKL2Portable(pts, pts, "vec_id",
        "embedding", k = 2, nPlanes = 3, nprobe = 8)
      .select($"query_id".as("p"), $"vec_id".as("o"),
        (-$"negl2").as("d2"))
    val ann = Similarity.lofFromKnn(knn, k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("kdist"), r.getAs[Any]("lrd"),
          r.getAs[Double]("lof"))).toMap
    val exact = Similarity.lofOutliers(pts, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("kdist"), r.getAs[Any]("lrd"),
          r.getAs[Double]("lof"))).toMap
    assert(ann === exact)
  }

  test("ANN-fed LOF at partial probe still ranks the outlier first") {
    val knn = Similarity.ivfTopKL2Portable(pts, pts, "vec_id",
        "embedding", k = 2, nPlanes = 3, nprobe = 3)
      .select($"query_id".as("p"), $"vec_id".as("o"),
        (-$"negl2").as("d2"))
    val out = Similarity.lofFromKnn(knn, k = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("lof")).toMap
    assert(out.nonEmpty && out.maxBy(_._2)._1 == 5L, s"got $out")
  }

  test("ANN-fed knnVote ≡ exact knnVote at full probe") {
    val qs = labeled.filter($"vec_id" < 6L)
    val knn = Similarity.ivfTopKL2Portable(labeled, qs, "vec_id",
      "embedding", k = 3, nPlanes = 3, nprobe = 8)
    val ann = Similarity.knnVoteFromKnn(knn, labeled, qs,
        "vec_id", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    val exact = Similarity.knnVote(labeled, qs, "vec_id", "embedding",
        "label", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(ann === exact)
  }

  test("dbscan: planted clusters separate, border attaches, noise null") {
    // two tight 1-d clusters (0,1,2) and (10,11,12), a border point at
    // 3.5 (within eps of 2 only — not core at minPts=3 since it has
    // one neighbor), and an isolated noise point at 50
    val pts = Seq(
      (0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(2.0f)),
      (3L, Seq(3.5f)),
      (10L, Seq(10.0f)), (11L, Seq(11.0f)), (12L, Seq(12.0f)),
      (50L, Seq(50.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.dbscanCached(pts, "vec_id", "embedding",
        eps2 = 4.5, minPts = 3) // eps ≈ 2.12: adjacent + next-adjacent
      .df.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got.size == 8)
    // cluster ids are the min core id of each component
    assert(got(0L) == ((2L, true, Some(0L))))  // sees 1, 2
    assert(got(1L) == ((2L, true, Some(0L))))  // sees 0, 2 (3.5 is 2.5 off)
    assert(got(2L) == ((3L, true, Some(0L))))  // sees 0, 1, 3.5
    // border: 1 neighbor (vec 2) → not core, attaches to cluster 0
    assert(got(3L) == ((1L, false, Some(0L))))
    assert(got(10L) == ((2L, true, Some(10L))))
    assert(got(11L) == ((2L, true, Some(10L))))
    assert(got(12L) == ((2L, true, Some(10L))))
    // noise: no neighbors, no cluster
    assert(got(50L) == ((0L, false, None)))
  }

  test("dbscanFromPairs over the exact pair frame ≡ dbscanCached") {
    // the factored algebra (the lofFromKnn companion) must reproduce
    // the fused form exactly when fed the same eps-pairs — the gate
    // that lets an LSH/IVF pair frame swap in at scale
    val pts8 = Seq(
      (0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(2.0f)),
      (3L, Seq(3.5f)), (10L, Seq(10.0f)), (11L, Seq(11.0f)),
      (12L, Seq(12.0f)), (50L, Seq(50.0f))
    ).toDF("vec_id", "embedding")
    val fused = Similarity.dbscanCached(pts8, "vec_id", "embedding",
        eps2 = 4.5, minPts = 3)
      .df.collect().map(_.toSeq).toSet
    // independent exact pair frame (both directions, d2 <= eps2)
    val rows = pts8.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).head.toDouble)
    val pairRows = for {
      (p, vp) <- rows; (o, vo) <- rows
      if p != o && (vp - vo) * (vp - vo) <= 4.5
    } yield (p, o)
    val nbrs = pairRows.toSeq.toDF("p", "o")
    val factored = Similarity.dbscanFromPairs(nbrs,
        pts8.select($"vec_id"), minPts = 3)
      .df.collect().map(_.toSeq).toSet
    assert(factored === fused)
  }

  test("dbscan: a core point with only border neighbors seeds itself") {
    // hub at 0 with three spokes at ±1.4, 1.5: spokes see only the hub
    // (pairwise spoke distances > eps) → hub is core with no core
    // neighbors → coalesces to its own id
    val pts = Seq(
      (5L, Seq(0.0f)), (1L, Seq(1.4f)), (2L, Seq(-1.4f)),
      (3L, Seq(0.0f, 1.4f).take(1))
    ).toDF("vec_id", "embedding")
    val got = Similarity.dbscanCached(
        pts.filter($"vec_id" =!= 3L), "vec_id", "embedding",
        eps2 = 2.0, minPts = 3)
      .df.collect().map(r => r.getLong(0) ->
        (r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // hub 5: two neighbors → core; spokes: one neighbor each → border
    assert(got(5L) == ((true, Some(5L))))
    assert(got(1L) == ((false, Some(5L))))
    assert(got(2L) == ((false, Some(5L))))
  }

  test("knnVote: a 2-2 split breaks the tie to the smallest label") {
    val qs = labeled.filter($"vec_id" === 2L)
    // q2 at 2.0: 4-NN = {1, 0, 3, 4} -> labels {0, 0, 1, 1}
    val r = Similarity.knnVote(labeled, qs, "vec_id", "embedding",
      "label", k = 4).head()
    assert(r.getInt(2) === 0 && r.getLong(3) === 2L, r.toString)
  }
}
