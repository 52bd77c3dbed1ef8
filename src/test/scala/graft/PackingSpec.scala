package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Training-sequence packing: hand-computed fixtures for both
  * disciplines, the per-doc next-fit invariants replayed in plain
  * Scala, and partitioning invariance.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // one shard (nShards = 1): ids 1..6 with token counts chosen so the
  // fills are hand-checkable at capacity 10
  private val docs = Seq(
    (1L, 4L), (2L, 5L), (3L, 3L), (4L, 9L), (5L, 2L), (6L, 11L))
    .toDF("id", "ntok")

  test("chunk pack: offsets, bins, straddle flags by hand") {
    val got = Packing.chunkPack(docs, "id", "ntok",
        capacity = 10L, nShards = 1)
      .select($"id", $"start", $"bin_first", $"bin_last", $"straddles")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1).toSeq
    // stream offsets: 0,4,9,12,21,23; doc 2 spans [4,8] (bin 0),
    // doc 3 spans [9,11] -> bins 0..1 (straddles), doc 4 [12,20] ->
    // 1..2, doc 6 [23,33] -> 2..3
    assert(got == Seq(
      (1L, 0L, 0L, 0L, false),
      (2L, 4L, 0L, 0L, false),
      (3L, 9L, 0L, 1L, true),
      (4L, 12L, 1L, 2L, true),
      (5L, 21L, 2L, 2L, false),
      (6L, 23L, 2L, 3L, true)), got.toString)
  }

  test("chunk pack stats: n_bins = ceil(tokens/capacity)") {
    val row = Packing.chunkPackStats(docs, "id", "ntok",
        capacity = 10L, nShards = 1)
      .select($"n_docs", $"n_tokens", $"n_bins", $"n_straddling")
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((6L, 34L, 4L, 3L)))
  }

  test("next-fit stats: bins close on overflow; oversize docs take a " +
      "bin alone; the fold matches a plain-Scala replay") {
    // fills at cap 10: [4+5] close, [3] close (9 would overflow),
    // [9] close, [2] close (11 overflows), [11] oversize open
    val row = Packing.nextFitStats(docs, "id", "ntok",
        capacity = 10L, nShards = 1)
      .select($"n_docs", $"n_tokens", $"n_bins", $"last_fill",
        $"n_oversize", $"eff_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(row == ((6L, 34L, 5L, 11L, 1L, 34L * 1000000L / 50L)),
      row.toString)
    // plain-Scala per-doc replay (the spec-side reference for the
    // per-doc assignment the fold-state form aggregates away)
    def replay(toks: Seq[Long], cap: Long): (Long, Long) =
      toks.tail.foldLeft((1L, toks.head)) { case ((b, f), t) =>
        if (f + t <= cap) (b, f + t) else (b + 1L, t)
      }
    val rnd = new scala.util.Random(7)
    val big = (1L to 500L).map(i => (i, 1L + rnd.nextInt(600).toLong))
    val (bins, fill) = replay(big.map(_._2), 512L)
    val got = Packing.nextFitStats(big.toDF("id", "ntok"), "id", "ntok",
        capacity = 512L, nShards = 1)
      .select($"n_bins", $"last_fill").as[(Long, Long)].head()
    assert(got == ((bins, fill)))
  }

  test("sharding is deterministic and results are partitioning-" +
      "invariant") {
    val many = (1L to 300L).map(i => (i, 1L + (i * 7) % 40)).toDF("id", "ntok")
    def run(parts: Int) = Packing.nextFitStats(many.repartition(parts),
        "id", "ntok", capacity = 64L, nShards = 8)
      .select($"shard", $"n_bins", $"last_fill")
      .as[(Long, Long, Long)].collect().toSet
    assert(run(1) == run(13))
    val c = Packing.chunkPackStats(many, "id", "ntok", 64L, 8)
      .agg(sum($"n_docs")).head().getLong(0)
    assert(c == 300L)
  }

  test("zero/negative token counts and nulls drop; capacity guard " +
      "fails loudly") {
    val messy = Seq((1L, 5L), (2L, 0L), (3L, -2L)).toDF("id", "ntok")
    val n = Packing.chunkPack(messy, "id", "ntok", 10L, 1).count()
    assert(n == 1L)
    intercept[IllegalArgumentException] {
      Packing.nextFitStats(docs, "id", "ntok", capacity = 0L, nShards = 1)
    }
  }

  test("first-fit-decreasing beats next-fit on the classic instance " +
      "(r12 mandate #3: the discipline comparison IS the capability)") {
    // cap 10, toks by id = [2,5,4,7,1,3,8]: next-fit (id order) opens
    // 5 bins; FFD sorts to [8,7,5,4,3,2,1] and packs 3 perfect bins
    val docs = Seq((1L, 2L), (2L, 5L), (3L, 4L), (4L, 7L), (5L, 1L),
      (6L, 3L), (7L, 8L)).toDF("id", "ntok")
    val nf = Packing.nextFitStats(docs, "id", "ntok", 10L, 1)
      .select($"n_bins", $"eff_ppm").as[(Long, Long)].head()
    assert(nf == ((5L, 30L * 1000000L / 50L)), nf.toString)
    val ffd = Packing.ffdStats(docs, "id", "ntok", 10L, 1)
      .select($"n_bins", $"min_fill", $"max_fill", $"eff_ppm")
      .as[(Long, Long, Long, Long)].head()
    assert(ffd == ((3L, 10L, 10L, 1000000L)), ffd.toString)
  }

  test("ffd: first-fit scans bins in OPEN order (not best-fit); " +
      "oversize docs open a bin alone; plain-Scala replay agrees") {
    // cap 10, sorted desc = [9,5,4,4]: 9 -> b1; 5 -> b2; 4 -> b2=9
    // (first fit, though b1 would leave less slack); 4 -> b3
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 4L), (4L, 4L))
      .toDF("id", "ntok")
    val got = Packing.ffdStats(docs, "id", "ntok", 10L, 1)
      .select($"n_bins", $"min_fill", $"max_fill").as[(Long, Long, Long)]
      .head()
    assert(got == ((3L, 4L, 9L)), got.toString)
    // oversize: 12 > cap takes a bin alone and accepts nothing
    val over = Packing.ffdStats(
      Seq((1L, 12L), (2L, 3L), (3L, 2L)).toDF("id", "ntok"),
      "id", "ntok", 10L, 1)
      .select($"n_bins", $"n_oversize", $"max_fill")
      .as[(Long, Long, Long)].head()
    assert(over == ((2L, 1L, 12L)), over.toString)
    // randomized replay: the SQL fold == the algorithm in plain Scala
    def replay(desc: Seq[Long], cap: Long): Vector[Long] =
      desc.foldLeft(Vector.empty[Long]) { (bins, t) =>
        bins.indexWhere(_ + t <= cap) match {
          case -1 => bins :+ t
          case i => bins.updated(i, bins(i) + t)
        }
      }
    val rnd = new scala.util.Random(31)
    val big = (1L to 400L).map(i => (i, 1L + rnd.nextInt(600).toLong))
    val fills = replay(
      big.sortBy { case (id, t) => (-t, id) }.map(_._2), 512L)
    val r = Packing.ffdStats(big.toDF("id", "ntok"), "id", "ntok",
        512L, 1)
      .select($"n_bins", $"min_fill", $"max_fill", $"n_tokens")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((fills.size.toLong, fills.min, fills.max, fills.sum)),
      r.toString)
  }

  test("duplicate ids fail loudly: packing order is by id, so a tie " +
      "would be engine-arbitrary (ADVICE r12)") {
    val dup = Seq((1L, 5L), (2L, 6L), (2L, 7L)).toDF("id", "ntok")
    val ex = intercept[IllegalArgumentException] {
      Packing.chunkPack(dup, "id", "ntok", 10L, 1)
    }
    assert(ex.getMessage.contains("unique"))
    intercept[IllegalArgumentException] {
      Packing.nextFitStats(dup, "id", "ntok", 10L, 1)
    }
  }

  test("eff_ppm overflow guard: tokens past Int64/1e6 per shard fail " +
      "loudly instead of wrapping (ADVICE r12)") {
    // the guard expression directly (driving 9.2e12 real tokens
    // through the fold is not a test): one row at the cap passes,
    // one past it raises
    val cap = Long.MaxValue / 1000000L
    val okRow = Seq((cap, 2L)).toDF("n_tokens", "n_bins")
      .select(Packing.effPpmExpr(1000000000000L, "n_tokens", "n_bins")
        .as("e")).as[Long].head()
    assert(okRow == cap * 1000000L / 2000000000000L)
    val ex = intercept[Exception] {
      Seq((cap + 1L, 2L)).toDF("n_tokens", "n_bins")
        .select(Packing.effPpmExpr(1000000000000L, "n_tokens", "n_bins"))
        .head()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(ex).contains("overflow"))
    // and the bins * capacity product is guarded too
    val ex2 = intercept[Exception] {
      Seq((100L, Long.MaxValue / 4L)).toDF("n_tokens", "n_bins")
        .select(Packing.effPpmExpr(8L, "n_tokens", "n_bins")).head()
    }
    assert(messages(ex2).contains("overflow"))
  }
}
