package graft

import graft.ops.AsOfJoin

/** Backward as-of join edge cases: inclusive ties, no-match nulls,
  * per-key isolation.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("picks latest right row ≤ left time; inclusive at equal ts") {
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 50.0), (1L, 8L, 80.0), (1L, 12L, 120.0),
      (2L, 9L, 90.0)).toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, "k", "t", "t", Seq("v"))
      .select($"tag", $"asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a") == Some(80.0))  // latest ≤ 10 is t=8
    assert(out("b") == Some(50.0))  // inclusive: t=5 matches t=5
    assert(out("c") == None)        // key 2 has no right row ≤ 7
  }

  test("keys do not leak matches across partitions") {
    val left = Seq((1L, 100L), (2L, 100L)).toDF("k", "t")
    val right = Seq((1L, 50L, 1.0)).toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, "k", "t", "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(1L) == Some(1.0) && out(2L) == None)
  }

  test("forward as-of picks the earliest right row at-or-after, inclusive") {
    val left = Seq((1L, 100L), (1L, 8L), (1L, 300L)).toDF("k", "lt")
      .select($"lt", $"k")
    val right = Seq((1L, 8L, 0.8), (1L, 150L, 1.5)).toDF("k", "t", "v")
    val out = AsOfJoin.forward(left, right, "k", "lt", "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(100L) == Some(1.5))  // next ahead
    assert(out(8L) == Some(0.8))    // inclusive at equal time
    assert(out(300L) == None)       // nothing ahead
  }

  test("nearest as-of picks the closer side, ties backward") {
    val left = Seq(
      (1L, 10L),   // bwd at 8 (d=2), fwd at 20 (d=10) → bwd
      (1L, 19L),   // bwd at 8 (d=11), fwd at 20 (d=1) → fwd
      (1L, 14L),   // tie: d=6 both → backward (8)
      (1L, 20L),   // exact hit → that row, distance 0
      (2L, 5L))    // key with no right rows → null
      .toDF("k", "lt")
    val right = Seq((1L, 8L, 0.8), (1L, 20L, 2.0)).toDF("k", "t", "v")
    val out = AsOfJoin.nearest(left, right, "k", "lt", "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out((1L, 10L)) == ((Some(8L), Some(0.8))))
    assert(out((1L, 19L)) == ((Some(20L), Some(2.0))))
    assert(out((1L, 14L)) == ((Some(8L), Some(0.8))), "tie must go backward")
    assert(out((1L, 20L)) == ((Some(20L), Some(2.0))))
    assert(out((2L, 5L)) == ((None, None)))
  }

  test("intervalOverlap: exact pairs, one emission per multi-bin pair") {
    import org.apache.spark.sql.functions.col
    // binWidth 10; pair (a1, b1) overlaps across bins 0..2 and must
    // appear ONCE; (a2, b2) touch only at one shared endpoint
    // (inclusive); a3/b3 are disjoint
    val a = Seq((1L, 0L, 25L), (2L, 30L, 40L), (3L, 100L, 101L))
      .toDF("aid", "a_start", "a_end")
    val b = Seq((1L, 5L, 22L), (2L, 40L, 50L), (3L, 200L, 201L),
      (4L, 26L, 29L)).toDF("bid", "b_start", "b_end")
    val got = graft.ops.RangeJoin.intervalOverlap(a, b,
        "a_start", "a_end", "b_start", "b_end", binWidth = 10)
      .select(col("aid"), col("bid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 1L), (2L, 2L)), got.toString)
    // inverted interval matches nothing
    val inv = Seq((9L, 50L, 10L)).toDF("aid", "a_start", "a_end")
    assert(graft.ops.RangeJoin.intervalOverlap(inv, b,
      "a_start", "a_end", "b_start", "b_end", 10).count() == 0)
  }

  test("intervalOverlap fails fast on colliding or reserved columns") {
    val a = Seq((1L, 0L, 5L)).toDF("aid", "start", "a_end")
    val b = Seq((1L, 2L, 9L)).toDF("bid", "start", "b_end")
    // same start name on both sides: ambiguous resolution, refuse early
    intercept[IllegalArgumentException] {
      graft.ops.RangeJoin.intervalOverlap(a, b,
        "start", "a_end", "start", "b_end", 10)
    }
    // one side also carries the OTHER side's range column name
    val b2 = Seq((1L, 2L, 9L, 7L)).toDF("bid", "b_start", "b_end", "a_end")
    intercept[IllegalArgumentException] {
      graft.ops.RangeJoin.intervalOverlap(a, b2,
        "start", "a_end", "b_start", "b_end", 10)
    }
    // reserved internal column present → refuse, not silent breakage
    val a3 = Seq((1L, 0L, 5L, 0L)).toDF("aid", "a_start", "a_end", "__bin")
    val b3 = Seq((1L, 2L, 9L)).toDF("bid", "b_start", "b_end")
    intercept[IllegalArgumentException] {
      graft.ops.RangeJoin.intervalOverlap(a3, b3,
        "a_start", "a_end", "b_start", "b_end", 10)
    }
  }
}
