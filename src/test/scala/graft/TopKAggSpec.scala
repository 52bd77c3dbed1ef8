package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** The bounded mergeable top-k aggregate must reproduce the
  * row_number-window ordering exactly — ties, NaN placement, fewer-
  * than-k groups — because n01/n07's hash oracle depends on it.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame,
                        k: Int): Seq[(String, Long, Double, Int)] = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("s").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("g", "id", "s", "rank")
      .as[(String, Long, Double, Int)].collect().toSeq.sorted
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame,
                     k: Int): Seq[(String, Long, Double, Int)] =
    df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), col("id"), k).as("tk"))
      .select(col("g"), explode(col("tk")).as("e"))
      .select(col("g"), col("e.id"), col("e.score"), col("e.rank"))
      .as[(String, Long, Double, Int)].collect().toSeq.sorted

  test("matches the row_number window on a seeded multi-partition frame") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 5000L).map { i =>
      (s"g${i % 7}", i, math.floor(rnd.nextDouble() * 50) / 10.0)
    }
    // coarse scores force heavy ties → the id tie-break is exercised;
    // 8 partitions force map-side partials + a real merge
    val df = rows.toDF("g", "id", "s").repartition(8)
    assert(viaAgg(df, 10) == viaWindow(df, 10))
  }

  test("groups with fewer than k rows return all rows, ranked") {
    val df = Seq(("a", 1L, 0.5), ("a", 2L, 0.9), ("b", 3L, 0.1))
      .toDF("g", "id", "s")
    assert(viaAgg(df, 10) == Seq(("a", 1L, 0.5, 2), ("a", 2L, 0.9, 1),
      ("b", 3L, 0.1, 1)))
  }

  test("NaN sorts largest and -0.0 ties 0.0 (Spark double ordering)") {
    val df = Seq(("a", 1L, 0.0), ("a", 2L, -0.0), ("a", 3L, Double.NaN),
      ("a", 4L, 1.0)).toDF("g", "id", "s")
    val got = viaAgg(df, 3).sortBy(_._4)
    assert(got.map(_._2) == Seq(3L, 4L, 1L)) // NaN first, then 1.0, then
    // -0.0/0.0 tie → id asc; compare via bits (tuple == is false on NaN)
    def bits(r: Seq[(String, Long, Double, Int)]) =
      r.map(t => (t._1, t._2, java.lang.Double.doubleToLongBits(t._3), t._4))
    assert(bits(viaAgg(df, 4)) == bits(viaWindow(df, 4)))
  }

  test("largest=false ranks smallest scores first (shortlist order)") {
    val df = Seq(("a", 1L, 3.0), ("a", 2L, 1.0), ("a", 3L, 2.0))
      .toDF("g", "id", "s")
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), col("id"), 2, largest = false).as("tk"))
      .select(explode(col("tk.id")).as("id"))
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 3L))
  }

  test("null scores and null ids are ignored") {
    val df = Seq(("a", Some(1L), Some(2.0)), ("a", None, Some(9.0)),
      ("a", Some(3L), None), ("a", Some(4L), Some(1.0)))
      .toDF("g", "id", "s")
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), col("id"), 10).as("tk"))
      .select(explode(col("tk.id")).as("id")).as[Long].collect().toSeq
    assert(got == Seq(1L, 4L))
  }

  test("string ids order lexicographically and survive the shuffle") {
    val df = Seq(("a", "x2", 1.0), ("a", "x10", 1.0), ("a", "x1", 1.0))
      .toDF("g", "id", "s").repartition(3)
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), col("id"), 2).as("tk"))
      .select(explode(col("tk.id")).as("id")).as[String].collect().toSeq
    assert(got == Seq("x1", "x10")) // lexicographic: "x1" < "x10" < "x2"
  }

  test("integer scores rank exactly (the n07 SQ8 path)") {
    val df = Seq(("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 7L))
      .toDF("g", "id", "s")
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), col("id"), 2).as("tk"))
      .select(col("tk.id").as("ids")).as[Seq[Long]].head()
    assert(got == Seq(1L, 2L))
  }
}
