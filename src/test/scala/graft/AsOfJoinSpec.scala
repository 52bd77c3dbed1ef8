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
}
