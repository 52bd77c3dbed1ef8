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
}
