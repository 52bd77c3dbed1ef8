package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Layout, Similarity}
import graft.queries.Tables

/** Diagnostic: print the power-iteration state round by round so a
  * diverging engine replay can be localized to its first bad round —
  * or, with `prod`, time the PRODUCTION composition (order-free
  * one-scan covariance over the FULL embeddings table feeding the same
  * iteration) for the scale probe; the n19 driver query itself is
  * vec_id-capped, so probing it against a scaled corpus is vacuous.
  * Usage: runMain graft.tools.PcaProbe <sfDir> [rounds|prod]
  */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    if (args.length > 1 && args(1) == "prod") { prodProbe(sfDir); return }
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val cov = Similarity.covarianceMatrixOrdered(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200),
      "vec_id", "embedding")
    val c7 = round(col("cov"), 7)
    val upper = cov.select(col("i"), col("j"), c7.as("c"))
    val full = upper.union(
      cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), c7.as("c")))
    val cells = Layout.materializeBounded(full, maxRows = 1L << 20)
    val dim = cells.agg(max(col("i"))).first().getInt(0) + 1
    var v = spark.createDataFrame(
      (0 until dim).map(i => (i, Similarity.PcaSeed))).toDF("vi", "vl")
    // print the first cells for cross-engine comparison
    cells.orderBy(col("i"), col("j")).limit(5).collect()
      .foreach(r => println(s"[pcaprobe] cell ${r.getInt(0)},${r.getInt(1)} = ${r.getDouble(2)}"))
    for (r <- 1 to rounds) {
      val w = Layout.materializeBounded(
        cells.join(v, cells("j") === v("vi"))
          .groupBy(col("i"))
          .agg(sum(round(col("c") * col("vl"), 7).cast("decimal(27,7)"))
            .as("w")), maxRows = 1L << 20)
      val nrm = w.agg(sqrt(sum((col("w").cast("decimal(18,7)") *
        col("w").cast("decimal(18,7)"))).cast("double")).as("nrm"))
      val nrmV = nrm.first().getDouble(0)
      println(s"[pcaprobe] round $r nrm = $nrmV")
      w.orderBy(col("i")).limit(4).collect().foreach(x =>
        println(s"[pcaprobe] round $r w(${x.getInt(0)}) = ${x.get(1)}"))
      v = Layout.materializeBounded(
        w.crossJoin(broadcast(nrm))
          .select(col("i").as("vi"),
            round(col("w").cast("double") / col("nrm"), 7).as("vl")),
        maxRows = 1L << 20)
      v.orderBy(col("vi")).limit(4).collect().foreach(x =>
        println(s"[pcaprobe] round $r v(${x.getInt(0)}) = ${x.getDouble(1)}"))
    }
    spark.stop()
  }

  private def prodProbe(sfDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val t0 = System.nanoTime()
    val out = Similarity.pcaPowerFromCov(
      Similarity.covarianceMatrix(emb, "embedding"), rounds = 8)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[pcaprobe] prod n=$n secs=$secs%.2f " +
      f"l1=${out.head.getDouble(2)}%.6f evr=${out.head.getDouble(3)}%.6f")
    spark.stop()
  }
}
