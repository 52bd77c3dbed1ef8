package graft

import org.apache.spark.sql.functions.col

import graft.ops.Upsert

/** Last-writer-wins upsert compaction: winner-per-key rule, tombstones,
  * tie-breaking, and the schema contract.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1, "a", 0L, false), (2, "b", 0L, false), (3, "c", 5L, false))
    .toDF("k", "v", "version", "del")

  test("highest version wins; change beats snapshot on a version tie") {
    val chg = Seq(
      (2, "b2", 1L, false), // plain update
      (3, "c2", 5L, false), // tie with snapshot version 5 → change wins
      (4, "d", 1L, false))  // brand-new key
      .toDF("k", "v", "version", "del")
    val out = Upsert.compact(snap, chg, Seq("k"), "version", Some("del"))
      .select("k", "v").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a", 2 -> "b2", 3 -> "c2", 4 -> "d"))
  }

  test("a tombstone consumes its key; later re-insert resurrects it") {
    val chg = Seq(
      (1, "x", 3L, true),  // delete key 1
      (2, "y", 1L, true),  // delete key 2 ...
      (2, "z", 2L, false)) // ... then resurrect at a higher version
      .toDF("k", "v", "version", "del")
    val out = Upsert.compact(snap, chg, Seq("k"), "version", Some("del"))
      .select("k", "v").as[(Int, String)].collect().toMap
    assert(out == Map(2 -> "z", 3 -> "c"))
  }

  test("null deleted flag is live; no deletedCol means nothing drops") {
    val chg = Seq((1, "x", 2L, null.asInstanceOf[java.lang.Boolean]))
      .toDF("k", "v", "version", "del")
    val withFlag = Upsert.compact(snap, chg, Seq("k"), "version", Some("del"))
    assert(withFlag.count() == 3)
    val noFlag = Upsert.compact(snap, chg, Seq("k"), "version", None)
      .select("k", "v").as[(Int, String)].collect().toMap
    assert(noFlag(1) == "x")
  }

  test("mismatched change schema is rejected") {
    val bad = Seq((1, 0L)).toDF("k", "version")
    intercept[IllegalArgumentException] {
      Upsert.compact(snap, bad, Seq("k"), "version", None)
    }
  }

  test("snapshotDiff classifies ids by content digest, nulls null-safely") {
    val oldSnap = Seq((1L, "same"), (2L, "before"), (3L, "gone"),
      (5L, null: String), (6L, null: String))
      .toDF("id", "text")
    val newSnap = Seq((1L, "same"), (2L, "after"), (4L, "fresh"),
      (5L, null: String), (6L, "filled in"))
      .toDF("id", "text")
    val m = Upsert.snapshotDiff(oldSnap, newSnap, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "changed"), m.toString)
  }

  test("scd2 builds per-key validity chains; last change stays open") {
    import org.apache.spark.sql.functions.col
    val changes = Seq(
      (1, 10L, "a"), (1, 20L, "b"), (1, 30L, "c"), // 3-version chain
      (2, 5L, "x")) // single version → immediately current
      .toDF("k", "version", "v")
    val got = Upsert.scd2(changes, Seq("k"), "version")
      .select(col("k"), col("valid_from"), col("valid_to"), col("is_current"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
      .toSet
    assert(got == Set(
      (1, 10L, Some(20L), false),
      (1, 20L, Some(30L), false),
      (1, 30L, None, true),
      (2, 5L, None, true)))
  }

  test("mergeAggState(aggState(a), aggState(b)) ≡ aggState(a ∪ b)") {
    val a = Seq(("x", 5L), ("x", -2L), ("y", 7L)).toDF("k", "v")
    val b = Seq[(String, java.lang.Long)](("x", 100L), ("z", 1L),
      ("y", -9L), ("y", null)).toDF("k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("n"), col("sum_v").cast("long"),
        col("min_v"), col("max_v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val merged = canon(Upsert.mergeAggState(
      Upsert.aggState(a, Seq("k"), "v"),
      Upsert.aggState(b, Seq("k"), "v"), Seq("k")))
    val full = canon(Upsert.aggState(a.unionByName(b), Seq("k"), "v"))
    assert(merged == full, s"merged=$merged full=$full")
    assert(merged == Set(("x", 3L, 103L, -2L, 100L),
      ("y", 2L, -2L, -9L, 7L), ("z", 1L, 1L, 1L, 1L)),
      merged.toString)
  }

  test("mergeAggState: delta-only keys appear, state-only keys survive") {
    val s0 = Upsert.aggState(Seq(("old", 4L)).toDF("k", "v"), Seq("k"), "v")
    val d0 = Upsert.aggState(Seq(("new", 9L)).toDF("k", "v"), Seq("k"), "v")
    val got = Upsert.mergeAggState(s0, d0, Seq("k"))
      .select(col("k"), col("n")).as[(String, Long)].collect().toSet
    assert(got == Set(("old", 1L), ("new", 1L)))
  }
}
