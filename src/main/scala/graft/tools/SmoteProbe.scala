package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for SMOTE (r9 verdict mandate #7 — never probed): runs
  * [[graft.ml.Smote.oversample]] over a lineitem-derived 2-class
  * frame of a (possibly ScaleUp'd) sf dir. Label = rare quantity band
  * (l_quantity <= 2, ~4% of rows), features = the three continuous
  * lineitem columns — so minority size, majority size, and therefore
  * the synthesis demand all scale linearly with the corpus. Cost
  * drivers to watch: the per-class LSH bucket join (capped at
  * maxBucketCandidates per bucket) and the `need`-row generator
  * (output-bound by construction: need = majority − minority ∝ rows).
  *
  * With the `volume` arg it instead A/Bs the PRE-DEDUP candidate
  * count (the r10 probe's 184 M-row agg input) between the legacy
  * shape (cap 256, no adaptive tables — candTarget = MaxValue keeps
  * every table) and the r11 shape (cap 64, adaptive candTarget = 2k)
  * — the mandate-#2 "shrunk >= 5x" evidence, measured not argued.
  *
  * Usage: runMain graft.tools.SmoteProbe <sfDir> [volume]
  */
object SmoteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val volumeMode = args.length > 1 && args(1) == "volume"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_quantity") <= 2.0).cast("int").as("label"),
        col("l_quantity").cast("double").as("x_qty"),
        col("l_discount").cast("double").as("x_disc"),
        col("l_tax").cast("double").as("x_tax"))
    val nIn = in.count() // warm the scan
    if (volumeMode) {
      val minority = in.filter(col("label") === 1)
      val base = graft.ml.Smote.prepare(minority,
        Seq("x_qty", "x_disc", "x_tax"))
      base.count()
      def vol(cap: Int, target: Int): Long =
        graft.ml.Smote.lshCandidates(base, dim = 3, k = 5,
          numTables = 3, bucketWidth = 2.0, seed = 42L,
          maxBucketCandidates = cap, candTarget = target).count()
      val legacy = vol(256, Int.MaxValue)
      val r11 = vol(64, 0)
      println(f"""{"probe":"smote_volume","dir":"$dir","n_in":$nIn,""" +
        f""""legacy_cand":$legacy,"r11_cand":$r11,""" +
        f""""shrink":${legacy.toDouble / math.max(1L, r11)}%.1f}""")
      base.unpersist()
      spark.stop()
      return
    }
    def onePass(): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = graft.ml.Smote.oversampleCached(in, "label",
        Seq("x_qty", "x_disc", "x_tax"))
      val n = out.df.count()
      out.release()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val runs = Seq(onePass(), onePass())
    val (secs, nOut) = runs.minBy(_._1)
    println(f"""{"probe":"smote","dir":"$dir","n_in":$nIn,""" +
      f""""n_out":$nOut,"n_synth":${nOut - nIn},"secs":$secs%.2f}""")
    spark.stop()
  }
}
