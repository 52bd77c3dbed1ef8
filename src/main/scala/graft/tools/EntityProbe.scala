package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Uncapped scale probe for the d15 entity-resolution shape: the
  * driver query pins its input to `doc_id < 300` (so the per-round
  * oracle row is scale-invariant — its flat probe curve measures
  * parquet predicate pushdown, not the join). This tool runs
  * [[graft.ops.FuzzyJoin.resolveEntities]] over the FULL documents
  * table of a (possibly ScaleUp'd) sf dir — 3-token names plus
  * first-char-dropped noisy twins, exactly d15's construction minus
  * the cap — and prints timing plus the output decomposition the
  * asymptote protocol requires (entities, member rows, and the
  * blocked candidate-pair volume that drives the cost).
  *
  * Usage: runMain graft.tools.EntityProbe <sfDir>
  */
object EntityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        array_join(slice(split(trim(lower(col("text"))), "\\s+"), 1, 3),
          " ").as("name"))
    val noisy = base.select((col("doc_id") + 500000000L).as("doc_id"),
      expr("substring(name, 2)").as("name"))
    val in = base.union(noisy)
    in.count() // warm the scan
    // candidate volume: pairs sharing an 8-char name suffix (the cost
    // driver resolveEntities' levenshtein verify runs over)
    val keyed = in.select(lower(col("name")).as("name"))
      .withColumn("bk", expr("right(name, 8)"))
    val candPairs = keyed.groupBy("bk").count()
      .agg(sum(expr("count * (count - 1) / 2")).cast("long"))
      .first().getLong(0)
    def onePass(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val ents = graft.ops.FuzzyJoin
        .resolveEntities(in, "doc_id", "name", blockChars = 8, maxDist = 2)
      val members = ents.count()
      val nEnt = ents.select("entity_id").distinct().count()
      ((System.nanoTime() - t0) / 1e9, nEnt, members)
    }
    onePass() // warmup
    val (secs, nEnt, members) = onePass()
    println(f"""{"probe":"entity","dir":"$dir","secs":$secs%.2f,""" +
      f""""entities":$nEnt,"members":$members,""" +
      f""""block_cand_pairs":$candPairs}""")
    spark.stop()
  }
}
