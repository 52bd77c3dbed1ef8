package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Poisson bootstrap — uncertainty estimates for grouped metrics in ONE
  * pass over the data (Chamandy et al., "Estimating Uncertainty for
  * Massive Data Streams", and the classic online-bootstrap observation
  * that Binomial(n, 1/n) → Poisson(1)). The textbook resample-n-rows
  * bootstrap needs global row indices and B full shuffles of the
  * corpus; the Poisson form gives every row an i.i.d. Poisson(1)
  * multiplicity PER REPLICATE, so B replicates are B weighted
  * aggregates that partial-aggregate map-side — the shuffle carries
  * groups × B partial rows, never data.
  *
  * Weights are a pure function of (row id, replicate): the uniform
  * driving each draw is the first 8 md5-hex chars of `"id:rep"`
  * (lexicographic == numeric for fixed-width hex), inverted through
  * the Poisson(1) CDF as 10 literal threshold comparisons. No JVM RNG
  * — replicates are identical across reruns, repartitions, retries,
  * and engines, so a CI computed today is re-derivable next quarter.
  * The inversion truncates at multiplicity 10 (P ≈ 1e-8 per draw);
  * value sums run in exact DECIMAL(18,2) space so every replicate
  * mean is bit-reproducible.
  */
object Bootstrap {

  /** Poisson(1) CDF c_k = e^-1 · Σ_{j≤k} 1/j!, k = 0..9. */
  private val poisson1Cdf: Seq[Double] = {
    val invFact = (1 to 9).scanLeft(1.0)((t, k) => t / k) // 1/k!, k=0..9
    invFact.scanLeft(0.0)(_ + _).tail.map(_ * math.exp(-1.0))
  }

  /** The CDF breakpoints as fixed-width 8-hex strings over the 32-bit
    * uniform space — shared verbatim by the Spark plan and any SQL
    * oracle rebuilt from them.
    */
  val thresholdsHex: Seq[String] =
    poisson1Cdf.map(c => f"${math.floor(c * 4294967296.0).toLong}%08x")

  /** First 8 md5-hex chars of `"<id>:<rep>"`. */
  private def drawKey(idCol: Column, repCol: Column): Column =
    substring(md5(concat(idCol.cast("string"), lit(":"),
      repCol.cast("string")).cast("binary")), 1, 8)

  /** Poisson(1) multiplicity: the number of CDF breakpoints at or
    * below the draw's uniform (truncated at 10).
    */
  def poissonWeight(keyHex: Column): Column =
    thresholdsHex.map(h => when(keyHex >= lit(h), 1).otherwise(0))
      .reduce(_ + _)

  /** B bootstrap replicates of the per-group mean of `valueCol`
    * (nulls excluded): one row per (group, rep) with the replicate's
    * effective count `n_eff` and `boot_mean` (null in the measure-zero
    * case every weight in a replicate is 0). The spread of `boot_mean`
    * across reps IS the sampling distribution of the group mean —
    * quantile it for a CI, std it for a standard error.
    *
    * Plan: explode ×B, then one hash aggregate; map-side partials
    * collapse each scan partition to groups × B rows before the
    * exchange.
    */
  def bootMeans(df: DataFrame, groupCol: String, idCol: String,
                valueCol: String, reps: Int = 32): DataFrame = {
    require(reps > 0, "reps must be positive")
    val rep = explode(sequence(lit(0), lit(reps - 1))).as("rep")
    val drawn = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(idCol),
        col(valueCol).cast(DecimalType(18, 2)).as("__v"), rep)
      .withColumn("__w", poissonWeight(drawKey(col(idCol), col("rep"))))
    drawn.groupBy(col(groupCol), col("rep").cast("long").as("rep"))
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__v")).as("__wsum"))
      .select(col(groupCol), col("rep"), col("n_eff"),
        when(col("n_eff") > 0,
          col("__wsum").cast("double") / col("n_eff")).as("boot_mean"))
  }
}
