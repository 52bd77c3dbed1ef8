package graft

import org.apache.spark.sql.functions._

import graft.ops.Seasonal

/** Integer seasonal decomposition — exact-recovery and truncation
  * contract.
  */
class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Long, hour: Long): Long =
    day * 86400000000L + hour * 3600000000L

  test("perfectly additive signal decomposes with zero residual") {
    // value = level(day) + rhythm(hour): trend recovers the level,
    // seasonal the rhythm, residual vanishes
    val rows = (for {
      day <- 0L to 1L; hour <- Seq(0L, 12L)
    } yield ("g", ts(day, hour),
      (if (day == 0) 150L else 350L) + (if (hour == 0) -50L else 50L)))
      .toDF("g", "ts_us", "cents")
    val out = Seasonal.decomposeDayHour(rows, "g", "ts_us", "cents")
    val got = out.select($"day", $"hour", $"trend", $"seasonal", $"resid")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 150L, -50L, 0L), (0L, 12L, 150L, 50L, 0L),
      (1L, 0L, 350L, -50L, 0L), (1L, 12L, 350L, 50L, 0L)))
  }

  test("a planted spike lands in the residual, not the components") {
    val base = for {
      day <- 0L to 3L; hour <- 0L to 3L
    } yield ("g", ts(day, hour) + day + hour, 1000L)
    val spiked = (base :+ ("g", ts(2L, 2L) + 1L, 17000L))
      .toDF("g", "ts_us", "cents")
    val out = Seasonal.decomposeDayHour(spiked, "g", "ts_us", "cents")
    // the spike is the single largest |resid| row, and it dominates
    // the collateral misfit it induces in its own day/hour cells
    val top2 = out.orderBy(abs(col("resid")).desc)
      .select($"cents", abs($"resid")).as[(Long, Long)].take(2)
    assert(top2(0)._1 == 17000L, s"top residual row ${top2(0)}")
    assert(top2(0)._2 >= 2 * top2(1)._2,
      s"spike ${top2(0)._2} vs runner-up ${top2(1)._2}")
    // rows sharing neither the spike's day nor hour stay exactly flat
    // through the trend (their day mean is untouched)
    val flatTrend = out.filter($"day" =!= 2)
      .select($"trend").distinct().as[Long].collect().toSeq
    assert(flatTrend == Seq(1000L), s"off-day trends $flatTrend")
  }

  test("integer means truncate toward zero (both engines' div)") {
    // one day, one hour, three rows: sum=10 → trend 10 div 3 = 3
    val rows = Seq(("g", ts(0, 0), 3L), ("g", ts(0, 0) + 1, 3L),
      ("g", ts(0, 0) + 2, 4L)).toDF("g", "ts_us", "cents")
    val out = Seasonal.decomposeDayHour(rows, "g", "ts_us", "cents")
    assert(out.select($"trend").distinct().as[Long].collect().toSeq
      == Seq(3L))
    // devs 0,0,1 → seasonal 1 div 3 = 0; resid 0,0,1
    assert(out.agg(sum($"resid")).first().getLong(0) == 1L)
  }

  test("backtest forecasts the held-out day from the last trend") {
    // train days 0..2 at rising levels 100/200/300 with a +-10 hourly
    // rhythm; holdout day 3 continues level 300 and the rhythm exactly,
    // so forecast == actual, zero error, zero-width band, covered
    val rows = (for {
      day <- 0L to 3L; hour <- Seq(0L, 12L)
      level = if (day == 3) 300L else (day + 1) * 100L
    } yield ("g", ts(day, hour), level + (if (hour == 0) -10L else 10L)))
      .toDF("g", "ts_us", "cents")
    val out = graft.ops.Seasonal
      .forecastBacktest(rows, "g", "ts_us", "cents")
      .orderBy($"hour")
      .select($"hour", $"forecast", $"lo", $"hi", $"actual",
        $"abs_err", $"covered")
      .as[(Long, Long, Long, Long, Long, Long, Int)].collect()
    assert(out.toSeq == Seq((0L, 290L, 290L, 290L, 290L, 0L, 1),
      (12L, 310L, 310L, 310L, 310L, 0L, 1)))
  }

  test("backtest drops holdout hours never seen in training") {
    val rows = (Seq(("g", ts(0, 0), 100L), ("g", ts(0, 12), 100L),
      ("g", ts(1, 0), 100L), ("g", ts(1, 12), 100L),
      ("g", ts(2, 0), 100L), ("g", ts(2, 5), 999L)))
      .toDF("g", "ts_us", "cents")
    val out = graft.ops.Seasonal
      .forecastBacktest(rows, "g", "ts_us", "cents")
    // holdout day 2: hour 0 forecastable, hour 5 unseen → dropped
    assert(out.select($"hour").as[Long].collect().toSeq == Seq(0L))
  }

  test("groups decompose independently; nulls drop") {
    val rows = Seq(
      ("a", ts(0, 0), 100L), ("a", ts(0, 1), 200L),
      ("b", ts(0, 0), 9000L), ("b", ts(0, 1), 9000L),
      (null.asInstanceOf[String], ts(0, 0), 5L))
      .toDF("g", "ts_us", "cents")
    val out = Seasonal.decomposeDayHour(rows, "g", "ts_us", "cents")
    assert(out.count() == 4)
    val trends = out.groupBy($"g").agg(min($"trend").as("t"))
      .as[(String, Long)].collect().toMap
    assert(trends == Map("a" -> 150L, "b" -> 9000L))
  }

  private def dayRows(g: String, counts: Seq[(Int, Int)]) =
    counts.flatMap { case (day, x) =>
      (1 to x).map(i => (g, day * 86400000000L + i))
    }

  test("acfDaily matches the hand-computed ACF on an alternating series") {
    // x = [3,1,3,1]: μ=2, den=4; acf1 = −3/4, acf2 = 2/4, acf3 = −1/4
    val rows = dayRows("g", Seq(0 -> 3, 1 -> 1, 2 -> 3, 3 -> 1))
      .toDF("g", "ts_us")
    val got = Seasonal.acfDaily(rows, "g", "ts_us", maxLag = 3)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1) == ((3L, -0.75)), got.toString)
    assert(got(2) == ((2L, 0.5)), got.toString)
    assert(got(3) == ((1L, -0.25)), got.toString)
  }

  test("acfDaily pairs by calendar distance across gaps") {
    // observed days 0,1,3 — lag1 has ONE pair (0,1), lag2 one (1,3),
    // lag3 one (0,3); row-adjacency lag would wrongly pair (1,3) at k=1
    val rows = dayRows("g", Seq(0 -> 2, 1 -> 4, 3 -> 6)).toDF("g", "ts_us")
    val pairs = Seasonal.acfDaily(rows, "g", "ts_us", maxLag = 3)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(pairs == Map(1 -> 1L, 2 -> 1L, 3 -> 1L), pairs.toString)
  }

  test("acfDaily: constant series has no variance → null acf") {
    val rows = dayRows("g", Seq(0 -> 5, 1 -> 5, 2 -> 5)).toDF("g", "ts_us")
    val out = Seasonal.acfDaily(rows, "g", "ts_us", maxLag = 1).collect()
    assert(out.length == 1 && out.head.isNullAt(3), out.mkString(","))
  }
}
