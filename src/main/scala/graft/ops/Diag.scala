package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opt-in skew diagnostics for the clustering / banded-dedup paths.
  *
  * A production dedup run dies slowly, not loudly: one giant connected
  * component (site-wide boilerplate) or one hot LSH bucket concentrates
  * a reducer and the job limps to a retry. These hooks surface both
  * shapes BEFORE they cost a retry, as a uniform frame —
  *
  *   kind: STRING ("component" | "bucket"), key: STRING, size: LONG
  *
  * — logged largest-first when `spark.graft.diagnostics=true` on the
  * session. Off by default: the benchmarked query plans pay nothing
  * (the hook is two extra jobs over already-persisted intermediates
  * when enabled, zero plan changes when not).
  */
object Diag {

  val confKey = "spark.graft.diagnostics"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption(confKey).exists(_.equalsIgnoreCase("true"))

  /** Component-size skew in the uniform diagnostic schema. */
  def componentSkew(labels: DataFrame, minSize: Long = 2L): DataFrame =
    Dedup.componentSizes(labels)
      .filter(col("size") >= minSize)
      .select(lit("component").as("kind"),
        col("component").cast("string").as("key"),
        col("size").cast("long").as("size"))

  /** Bucket-population skew (pre-cap) in the uniform schema. */
  def bucketSkew(banded: DataFrame, keyCols: Seq[String],
                 minSize: Long = 1000L): DataFrame =
    Layout.bucketStats(banded, keyCols, minSize)
      .select(lit("bucket").as("kind"),
        concat_ws("/", keyCols.map(col(_).cast("string")): _*).as("key"),
        col("n").cast("long").as("size"))

  /** Log the `topN` largest diagnostic rows for a named pass. Bounded
    * collect (topN rows); callers gate on [[enabled]] so disabled runs
    * never execute the diagnostic jobs.
    */
  def logTop(name: String, diag: DataFrame, topN: Int = 20): Unit = {
    val log = org.slf4j.LoggerFactory.getLogger("graft.diag")
    diag.orderBy(col("size").desc, col("kind"), col("key"))
      .limit(topN).collect()
      .foreach { r =>
        log.warn(s"[$name] skew ${r.getString(0)} key=${r.getString(1)} " +
          s"size=${r.getLong(2)}")
      }
  }
}
