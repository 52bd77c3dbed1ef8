package graft

import graft.ops.Stump

/** Depth-1 CART split selection: exact Gini argmin, tie rules,
  * confusion accounting.
  */
class StumpSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly separable data finds the zero-impurity split") {
    val rows = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0)).toDF("x", "label")
    val r = Stump.train(rows, "x", "label").first()
    assert(r.getLong(0) == 2L, s"threshold: $r")
    assert(r.getDouble(1) == 0.0, "weighted gini")
    assert(r.getInt(6) == 1 && r.getInt(7) == 0, "side majorities")
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("tn") == 2L &&
      r.getAs[Long]("fp") == 0L && r.getAs[Long]("fn") == 0L)
    assert(r.getAs[Double]("acc") == 1.0)
  }

  test("degenerate inputs yield zero rows, not an all-null model") {
    val one = Seq((5L, 1), (5L, 0), (5L, 1)).toDF("x", "label")
    assert(Stump.train(one, "x", "label").count() == 0,
      "single distinct x has no valid split")
    val empty = Seq.empty[(Long, Int)].toDF("x", "label")
    assert(Stump.train(empty, "x", "label").count() == 0)
  }

  test("equal-impurity thresholds tie-break to the smallest x") {
    // all labels 0: every split has wg = 0 → threshold = min x
    val rows = Seq((5L, 0), (7L, 0), (9L, 0)).toDF("x", "label")
    val r = Stump.train(rows, "x", "label").first()
    assert(r.getLong(0) == 5L, r.toString)
  }

  test("majority ties predict negative; confusion stays consistent") {
    // left of 1: one pos, one neg (tie -> 0); right: all pos
    val rows = Seq((1L, 1), (1L, 0), (2L, 1), (3L, 1)).toDF("x", "label")
    val r = Stump.train(rows, "x", "label").first()
    assert(r.getLong(0) == 1L, r.toString)
    assert(r.getInt(6) == 0 && r.getInt(7) == 1, r.toString)
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fn") == 1L &&
      r.getAs[Long]("tn") == 1L && r.getAs[Long]("fp") == 0L, r.toString)
    assert(r.getAs[Double]("acc") == 0.75)
  }
}
