package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Aggregates, AsOfJoin, Similarity}
import graft.queries.Tables

/** Uncapped arms for the driver queries whose input caps had no
  * covering SCALEPROBE row (the `check.py --caps` contract, r10
  * verdict mandate #3): runs the SAME operator the capped query calls
  * with the cap removed, against any corpus dir, and prints one
  * timing line per rep. Arms:
  *
  *  - `a07`  — [[Aggregates.lastPerKey]] over the FULL events table
  *             (a07_last_per_key caps user_id < 50)
  *  - `asof` — [[AsOfJoin.backward]] purchases×views over ALL users
  *             (j04/j08/j09 cap user_id < 100; backward/forward/
  *             nearest share the one-shuffle union-window shape, so
  *             one arm covers the family)
  *  - `f02`  — the format→concat→parse timestamp round trip over the
  *             FULL events table (f02 caps user_id < 20 and limits
  *             output; here the parse chain runs on every row)
  *  - `lsh`  — [[Similarity.cosineNearDupsLSH]] over the FULL
  *             embeddings table (n03's exact all-pairs is the capped
  *             baseline; this banded LSH is its scale path, and
  *             n04b's portable twin caps vec_id < 200)
  *  - `proj` — [[Similarity.randomProject]] over the FULL embeddings
  *             table (n09 caps vec_id < 100)
  *  - `sn`   — [[graft.ops.SortedNeighborhood.multiPass]] over the
  *             FULL documents table (d21 caps doc_id < 300); the
  *             SnProbe cover for the caps contract
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.CapProbe <dir> <arm> [reps]
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val arm = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): DataFrame = arm match {
      case "a07" =>
        Aggregates.lastPerKey(Tables.events(spark, dir),
          "user_id", "event_id", "value")
          .agg(count(lit(1)).as("n"),
            sum(round(col("last_value"), 2).cast("decimal(27,2)")).as("s"))
      case "asof" =>
        val ev = Tables.eventsMicros(spark, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us")
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max_by(col("value"), col("event_id")).as("value"))
        AsOfJoin.backward(purchases, views, keyCol = "user_id",
          leftTime = "ts_us", rightTime = "ts_us",
          rightValueCols = Seq("value"))
          .agg(count(lit(1)).as("n"),
            count(col("asof_value")).as("matched"))
      case "f02" =>
        val ts = timestamp_micros(col("ts_us"))
        Tables.eventsMicros(spark, dir)
          .withColumn("ds", date_format(ts, "yyyy-MM-dd"))
          .withColumn("tstr", date_format(ts, "HH:mm:ss"))
          .withColumn("parsed",
            to_timestamp(concat_ws(" ", col("ds"), col("tstr")),
              "yyyy-MM-dd HH:mm:ss"))
          .agg(count(col("parsed")).as("n"),
            sum(unix_timestamp(col("parsed"))).as("s"))
      case "lsh" =>
        Similarity.cosineNearDupsLSH(
          Tables.embeddings(spark, dir).select("vec_id", "embedding"),
          "vec_id", "embedding", threshold = 0.9)
          .agg(count(lit(1)).as("n_pairs"))
      case "proj" =>
        Similarity.randomProject(Tables.embeddings(spark, dir),
          "vec_id", "embedding", outDim = 16, seed = 42L)
          .select(explode(col("proj")).as("v"))
          .agg(sum(round(col("v"), 7).cast("decimal(27,7)")).as("s"))
      case "sn" =>
        // d21 uncapped: multi-pass sorted-neighborhood over the FULL
        // documents table (the driver query caps doc_id < 300);
        // prefixChars=4 + idBits=30 keys up to 1.07e9 docs (ScaleUp's
        // 50x copies reach doc_id ~4.9e8 under its 1e7 id offset)
        val all = Tables.documents(spark, dir)
          .select(col("doc_id"),
            array_join(slice(split(trim(lower(col("text"))), "\\s+"),
              1, 3), " ").as("name"))
          .filter(col("name").isNotNull)
        graft.ops.SortedNeighborhood.multiPass(all, "doc_id",
          Seq("fwd" -> col("name"), "rev" -> reverse(col("name"))),
          w = 12, prefixChars = 4, idBits = 30)
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("found_fwd"), 1L).otherwise(0L)).as("n_fwd"),
            sum(when(col("found_rev"), 1L).otherwise(0L)).as("n_rev"))
      case other => sys.error(s"unknown arm: $other")
    }
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val rows = run().collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[capprobe] arm=$arm rep=$rep secs=$secs%.2f " +
        s"out=${rows.map(_.toString).mkString(";").take(120)}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
