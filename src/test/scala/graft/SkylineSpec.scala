package graft

import graft.ops.Skyline

/** Hand-computed gates for the Pareto-frontier operator. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline: hand case — dominated points drop, frontier stays") {
    // (0,5) and (3,3) are the frontier; (2,3),(3,2) are dominated by
    // (3,3); (1,1) by everything
    val df = Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 3L, 2L),
      (4L, 3L, 3L), (5L, 0L, 5L)).toDF("id", "x", "y")
    val got = Skyline.skyline(df, "id", Seq("x", "y"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((4L, 3L, 3L), (5L, 0L, 5L)))
  }

  test("skyline: duplicate frontier vectors are ALL kept") {
    val df = Seq((1L, 3L, 3L), (2L, 3L, 3L), (3L, 1L, 1L))
      .toDF("id", "x", "y")
    val ids = Skyline.skyline(df, "id", Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L))
  }

  test("skyline: single dimension degenerates to the max (with ties)") {
    val df = Seq((1L, 7L), (2L, 7L), (3L, 4L)).toDF("id", "x")
    val ids = Skyline.skyline(df, "id", Seq("x"))
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L))
  }

  test("skyline: null dims/ids drop; empty input yields empty frontier") {
    val df = Seq((Some(1L), Some(2L), Some(2L)),
      (Some(2L), None, Some(9L)), (None, Some(9L), Some(9L)))
      .toDF("id", "x", "y")
    val ids = Skyline.skyline(df, "id", Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L))
    val empty = Skyline.skyline(df.limit(0), "id", Seq("x", "y"))
    assert(empty.count() === 0L)
  }

  test("skyline: maxFrontier guard refuses an unbounded exact pass") {
    // anti-chain: every point is on the frontier, none prunable
    val df = (1L to 20L).map(i => (i, i, 21L - i)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Skyline.skyline(df, "id", Seq("x", "y"), maxFrontier = 5L)
    }
    assert(e.getMessage.contains("maxFrontier"))
    // and at a sufficient bound the full anti-chain comes back
    assert(Skyline.skyline(df, "id", Seq("x", "y")).count() === 20L)
  }

  test("skylineCached: handle releases its backing frame") {
    val df = Seq((1L, 1L, 2L), (2L, 2L, 1L)).toDF("id", "x", "y")
    val c = Skyline.skylineCached(df, "id", Seq("x", "y"))
    assert(c.df.count() === 2L)
    c.release()
  }
}
