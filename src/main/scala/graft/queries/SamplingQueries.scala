package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic sampling coverage (portable md5 mode — the DuckDB
  * oracle draws the identical sample; XXH64 mode is spec-gated in
  * SamplingSpec).
  */
object SamplingQueries extends QuerySet {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ~20% deterministic corpus sample, per-lang survivor stats.
    "sm01_hash_sample" -> ((s, d) =>
      Sampling.hashSample(
        Tables.documents(s, d).select("doc_id", "lang"),
        "doc_id", fraction = 0.2, portable = true)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))),

    // exactly 20 docs per language, chosen in id-hash order.
    "sm02_stratified_take" -> ((s, d) =>
      Sampling.stratifiedTake(
        Tables.documents(s, d).select("doc_id", "lang"),
        "lang", "doc_id", n = 20, portable = true)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))),

    // 80/10/10 train/val/test assignment as a pure id-hash function —
    // rerun-/append-/engine-stable (the property randomSplit lacks).
    "sm03_split_assign" -> ((s, d) =>
      Sampling.assignSplit(
        Tables.documents(s, d).select("doc_id", "lang"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), portable = true)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("split"))),

    // Deterministic data mixture: sample langs down to 50/20/20/10
    // proportions at the largest feasible total (binding source keeps
    // all rows); 'es' has no weight and drops.
    "sm04_mix_corpus" -> ((s, d) =>
      Sampling.mixCorpus(Tables.documents(s, d).select("doc_id", "lang"),
        "lang", "doc_id",
        Map("en" -> 0.5, "zh" -> 0.2, "de" -> 0.2, "fr" -> 0.1),
        portable = true)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang")))
  )

  def oracle: Map[String, String] = Map(
    "sm01_hash_sample" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '33333333'
         GROUP BY lang ORDER BY lang""",
    "sm02_stratified_take" ->
      """WITH r AS (
           SELECT lang, doc_id,
                  ROW_NUMBER() OVER (
                    PARTITION BY lang
                    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                             doc_id) AS rn
           FROM documents)
         SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM r WHERE rn <= 20
         GROUP BY lang ORDER BY lang""",
    "sm03_split_assign" ->
      """SELECT split, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM (SELECT doc_id,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        < 'cccccccc' THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        < 'e6666666' THEN 'val'
                      ELSE 'test' END AS split
               FROM documents)
         GROUP BY split ORDER BY split""",
    "sm04_mix_corpus" ->
      """WITH w(src, wt) AS (VALUES ('en', 0.5), ('zh', 0.2),
                                    ('de', 0.2), ('fr', 0.1)),
         c AS (SELECT lang AS src, COUNT(*) AS n
               FROM documents JOIN w ON lang = w.src GROUP BY lang),
         k AS (SELECT MIN(n / wt) AS k FROM c JOIN w USING (src)),
         fr AS (SELECT src, k * wt / n AS f
                FROM c JOIN w USING (src) CROSS JOIN k),
         sel AS (
           SELECT d.doc_id, d.lang
           FROM documents d JOIN fr ON d.lang = fr.src
           WHERE f >= 1.0 OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
                 printf('%08x', CAST(floor(f * 4294967296.0) AS BIGINT)))
         SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM sel GROUP BY lang ORDER BY lang"""
  )
}
